"""Host data-loader throughput: serial decode loop vs threaded prefetcher.

Pure host benchmark (no device): generates B stereo float32 WAVs, then
measures wall time to stream-decode and assemble every 64 s slab via
(a) a serial per-stream loop and (b) io_.prefetch.SlabPrefetcher with a
worker pool over the native codec path.

    python benchmarks/loader_bench.py [--streams 8] [--minutes 2]

NOTE: this container exposes ONE CPU core (nproc=1), so decode parallelism
cannot show a speedup here — the prefetcher auto-sizes its pool to
cpu_count and measures ~1.0x (no regression). On a production host with
N cores the pool decodes N streams concurrently; the pipeline win against
device compute applies regardless.
"""

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from formula_vad_tpu.io_.prefetch import SlabPrefetcher
from formula_vad_tpu.io_.wav import WavStream, write_wav

CHUNK = 24000
SLAB_CHUNKS = 128  # 64 s


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=int, default=8)
    ap.add_argument("--minutes", type=float, default=2.0)
    ap.add_argument("--workers", type=int, default=None)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    n = int(args.minutes * 60 * 48000)
    tmp = tempfile.mkdtemp(prefix="fvad_loader_bench_")
    paths = []
    for i in range(args.streams):
        p = os.path.join(tmp, f"s{i}.wav")
        write_wav(p, (0.1 * rng.standard_normal((2, n))).astype(np.float32), 48000)
        paths.append(p)
    lengths = [n] * args.streams
    valid = [n // CHUNK] * args.streams
    n_slabs = (valid[0] + SLAB_CHUNKS - 1) // SLAB_CHUNKS
    audio_sec = args.streams * args.minutes * 60

    def make_readers():
        streams = [WavStream(p) for p in paths]

        def mk(st):
            def read(start, cnt):
                st.seek_to_sample(start)
                return st.read(cnt)

            return read

        return streams, [mk(st) for st in streams]

    # --- serial loop (the pre-prefetcher slab assembly) ---
    streams, readers = make_readers()
    t0 = time.perf_counter()
    for s in range(n_slabs):
        slab = np.zeros((args.streams, 2, SLAB_CHUNKS * CHUNK), np.float32)
        for i in range(args.streams):
            nv = int(np.clip(valid[i] - s * SLAB_CHUNKS, 0, SLAB_CHUNKS))
            if nv:
                d = readers[i](s * SLAB_CHUNKS * CHUNK, nv * CHUNK)
                slab[i, :, : d.shape[1]] = d
    t_serial = time.perf_counter() - t0
    for st in streams:
        st.close()

    # --- threaded prefetcher ---
    streams, readers = make_readers()
    pf = SlabPrefetcher(
        readers, valid, n_slabs=n_slabs, slab_chunks=SLAB_CHUNKS,
        chunk_size=CHUNK, n_channels=2, b_pad=args.streams,
        workers=args.workers,
    )
    t0 = time.perf_counter()
    for s in range(n_slabs):
        pf.get()
    t_prefetch = time.perf_counter() - t0
    pf.close()
    for st in streams:
        st.close()

    print(f"streams={args.streams} minutes={args.minutes} slabs={n_slabs}")
    print(f"serial loop : {t_serial:6.2f} s  ({audio_sec/t_serial:8.0f}x realtime)")
    print(f"prefetcher  : {t_prefetch:6.2f} s  ({audio_sec/t_prefetch:8.0f}x realtime)"
          f"  speedup {t_serial/t_prefetch:.2f}x")
    return 0


if __name__ == "__main__":
    sys.exit(main())
