"""SlabPrefetcher: ordering, ragged EOF handling, error propagation, and
identity with the serial assembly it replaced."""

import time

import numpy as np
import pytest

from formula_vad_tpu.io_.prefetch import SlabPrefetcher

CHUNK = 24000


def _mk_reader(data):
    def read(start, n):
        return data[:, start : start + n]

    return read


def _serial_slab(datas, valid_chunks, s, slab_chunks, b_pad, c):
    slab = np.zeros((b_pad, c, slab_chunks * CHUNK), np.float32)
    cv = np.zeros((b_pad, slab_chunks), bool)
    for i, d in enumerate(datas):
        n_valid = int(np.clip(valid_chunks[i] - s * slab_chunks, 0, slab_chunks))
        if n_valid == 0:
            continue
        data = d[:, s * slab_chunks * CHUNK : (s * slab_chunks + n_valid) * CHUNK]
        slab[i, :, : data.shape[1]] = data
        cv[i, :n_valid] = True
    return slab, cv


def test_matches_serial_assembly_ragged():
    rng = np.random.default_rng(0)
    lengths = [5 * CHUNK, 12 * CHUNK, 3 * CHUNK]  # ragged, not slab-aligned
    datas = [rng.standard_normal((2, l)).astype(np.float32) for l in lengths]
    valid = [l // CHUNK for l in lengths]
    slab_chunks, b_pad = 4, 4  # includes one padding row
    n_slabs = 3

    pf = SlabPrefetcher(
        [_mk_reader(d) for d in datas], valid,
        n_slabs=n_slabs, slab_chunks=slab_chunks, chunk_size=CHUNK,
        n_channels=2, b_pad=b_pad, workers=3,
    )
    try:
        for s in range(n_slabs):
            slab, cv = pf.get()
            ref_slab, ref_cv = _serial_slab(datas, valid, s, slab_chunks, b_pad, 2)
            np.testing.assert_array_equal(slab, ref_slab)
            np.testing.assert_array_equal(cv, ref_cv)
    finally:
        pf.close()


def test_reader_exception_propagates():
    def bad_reader(start, n):
        raise ValueError("decode failed")

    pf = SlabPrefetcher(
        [bad_reader], [8],
        n_slabs=2, slab_chunks=4, chunk_size=CHUNK, n_channels=2, b_pad=1,
    )
    try:
        with pytest.raises(ValueError, match="decode failed"):
            pf.get()
    finally:
        pf.close()


def test_readers_called_serially_per_stream():
    """Slabs are produced in order, so a stateful reader never sees
    concurrent or out-of-order calls."""
    calls = []

    def reader(start, n):
        calls.append(start)
        time.sleep(0.01)
        return np.zeros((2, n), np.float32)

    pf = SlabPrefetcher(
        [reader], [8],
        n_slabs=2, slab_chunks=4, chunk_size=CHUNK, n_channels=2, b_pad=1,
        workers=4, depth=2,
    )
    try:
        pf.get()
        pf.get()
    finally:
        pf.close()
    assert calls == [0, 4 * CHUNK]


def test_truncated_reader_invalidates_padded_tail():
    """A WAV whose header overstates its length yields short reads; the
    zero-padded tail chunks must NOT be marked valid (ADVICE round 1)."""
    rng = np.random.default_rng(7)
    declared_chunks = 6
    actual = rng.standard_normal((2, 3 * CHUNK + CHUNK // 2)).astype(np.float32)

    pf = SlabPrefetcher(
        [_mk_reader(actual)], [declared_chunks],
        n_slabs=2, slab_chunks=4, chunk_size=CHUNK,
        n_channels=2, b_pad=1, workers=1,
    )
    try:
        slab0, cv0 = pf.get()
        slab1, cv1 = pf.get()
    finally:
        pf.close()
    # Slab 0: 4 chunks requested, but the reader only backs 3.5 — chunk 3
    # is half zero-padding and must be invalid.
    np.testing.assert_array_equal(cv0[0], [True, True, True, False])
    np.testing.assert_array_equal(slab0[0, :, : 3 * CHUNK + CHUNK // 2], actual)
    # Slab 1: chunks 4-5 declared but past EOF entirely.
    np.testing.assert_array_equal(cv1[0], [False, False, False, False])
    assert not slab1.any()


def test_dtype_and_channel_mismatch_raise():
    """raw16 slabs must reject float readers (indexed assignment would cast
    float audio in [-1, 1) to all-zero int16 silently) and mono readers (a
    [1, T] result would broadcast into every slab channel row)."""
    f32 = np.random.default_rng(1).standard_normal((2, 2 * CHUNK)).astype(np.float32)

    pf = SlabPrefetcher(
        [_mk_reader(f32)], [2], n_slabs=1, slab_chunks=2, chunk_size=CHUNK,
        n_channels=2, b_pad=1, workers=1, dtype=np.int16,
    )
    try:
        with pytest.raises(TypeError, match="int16 slab"):
            pf.get()
    finally:
        pf.close()

    mono = f32[:1]
    pf2 = SlabPrefetcher(
        [_mk_reader(mono)], [2], n_slabs=1, slab_chunks=2, chunk_size=CHUNK,
        n_channels=2, b_pad=1, workers=1,
    )
    try:
        with pytest.raises(ValueError, match="channels"):
            pf2.get()
    finally:
        pf2.close()
