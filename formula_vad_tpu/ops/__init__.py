from . import dft, resample, stft, volume, windows  # noqa: F401
