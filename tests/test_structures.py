"""Host ring buffer / recorder unit tests — the analogue of the reference's
hand-drawn MultiRingBuffer wrap tests (MultiRingBuffer.zig:218-264) and
SegmentWriter packing tests (SegmentWriter.zig:130-181)."""

import numpy as np
import pytest

from formula_vad_tpu.pipeline.pipeline import RingBuffer, StreamRecorder


class TestRingBuffer:
    def test_wrap_semantics(self):
        rb = RingBuffer(1, 8)
        rb.write(np.arange(5, dtype=np.float32)[None])
        np.testing.assert_array_equal(rb.read(0, 5)[0], [0, 1, 2, 3, 4])
        rb.write(np.arange(5, 11, dtype=np.float32)[None])  # wraps
        assert rb.total_written == 11
        np.testing.assert_array_equal(rb.read(3, 11)[0], [3, 4, 5, 6, 7, 8, 9, 10])

    def test_oversize_write_keeps_tail(self):
        rb = RingBuffer(2, 4)
        rb.write(np.arange(20, dtype=np.float32).reshape(2, 10))
        assert rb.total_written == 10
        np.testing.assert_array_equal(rb.read(6, 10)[0], [6, 7, 8, 9])
        np.testing.assert_array_equal(rb.read(6, 10)[1], [16, 17, 18, 19])

    def test_read_out_of_range(self):
        rb = RingBuffer(1, 4)
        rb.write(np.ones((1, 6), np.float32))
        with pytest.raises(IndexError):
            rb.read(0, 2)  # overwritten
        with pytest.raises(IndexError):
            rb.read(5, 7)  # beyond written

    def test_absolute_indexing_across_many_wraps(self):
        rb = RingBuffer(1, 7)
        data = np.arange(100, dtype=np.float32)
        for i in range(0, 100, 3):
            rb.write(data[None, i : i + 3])
        np.testing.assert_array_equal(rb.read(95, 99)[0], [95, 96, 97, 98])


class TestStreamRecorder:
    def _setup(self, cap=100):
        rb = RingBuffer(2, cap)
        return rb, StreamRecorder(rb, 48000)

    def test_preroll_from_ring(self):
        rb, rec = self._setup()
        rb.write(np.tile(np.arange(50, dtype=np.float32), (2, 1)))
        rec.start(30)  # 20 samples of pre-roll
        buf = rec.stop(50, keep=True)
        assert buf is not None
        assert buf.global_start_frame_number == 30
        assert buf.length == 20
        np.testing.assert_array_equal(buf.channel_pcm[0], np.arange(30, 50))

    def test_deferred_stop(self):
        rb, rec = self._setup()
        rb.write(np.zeros((2, 40), np.float32))
        rec.start(0)
        assert rec.stop(60, keep=True) is None  # future index -> deferred
        chunk = np.ones((2, 30), np.float32)
        rb.write(chunk)
        buf = rec.on_new_samples(chunk)
        assert buf is not None and buf.length == 60

    def test_abort_discards(self):
        rb, rec = self._setup()
        rb.write(np.zeros((2, 40), np.float32))
        rec.start(0)
        assert rec.stop(0, keep=False) is None
        assert not rec.recording

    def test_quietest_channel_selected(self):
        rb, rec = self._setup()
        loud = np.ones((1, 40), np.float32)
        quiet = np.full((1, 40), 0.1, np.float32)
        rb.write(np.concatenate([loud, quiet]))
        rec.start(0)
        buf = rec.stop(40, keep=True)
        np.testing.assert_array_equal(buf.channel_pcm[0], quiet[0])
