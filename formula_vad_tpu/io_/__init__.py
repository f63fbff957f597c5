from . import audio, wav  # noqa: F401
from .audio import AudioBuffer, AudioSource  # noqa: F401
