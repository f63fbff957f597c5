// Host-side speech-FSM decoder for formula_vad_tpu.
//
// Runs the exact per-window semantics of pipeline/fsm.py::step_window
// (itself the VADMachine.zig:138-325 state machine) over [B, W] batches of
// per-window inputs that the TPU front-end produced.  Rationale
// (ROOFLINE.md): the FSM is the pipeline's only inherently serial stage;
// on the TPU it costs ~136 ns/window of scalar-core time inside the Pallas
// kernel (2.7 ms of a 14 ms batch step), while a host core retires the
// same dependency chain in a few ns/window — and the host is otherwise
// idle while the device crunches the next slab.  The decode therefore
// overlaps device compute entirely instead of serializing it.
//
// Numerics contract (PARITY.md deviation 9's class): the three rolling
// averages are maintained as Kahan-compensated f32 running sums (seeded
// exactly from the carried ring via fvad_fsm_kahan_seed), like the Pallas
// kernel; every other operation is plain IEEE f32/int32 in the reference
// order, so outputs are bit-identical to the kernel path unless a
// threshold comparison lands on an exact ulp tie of the ring average.
// Build MUST use -ffp-contract=off (see Makefile): FMA contraction would
// change the Kahan rounding.
//
// All arrays are C-contiguous; carry arrays are updated in place so calls
// chain bit-exactly (the Kahan state is part of the carry — unlike the
// per-call reseed of the Pallas kernel, slab chaining here is EXACTLY
// continuous with the one-shot run).

#include <cstdint>
#include <algorithm>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

// Register-file layout, identical to pipeline/fsm_pallas.py.
enum {
  I_LONG_IDX, I_LONG_CNT, I_SHORT_IDX, I_SHORT_CNT, I_RATIO_IDX,
  I_RATIO_CNT, I_STATE, I_START, I_END, I_SEG_CNT, NI
};
enum { F_LONG_LAST, F_SEG_SUM, F_MET_SEC, NF };
// kahan layout per stream: (sum, comp) x (long, short, ratio)
enum { NK = 6 };

enum { CLOSED = 0, OPENING = 1, OPEN = 2, CLOSING = 3 };
enum { EV_NONE = 0, EV_STARTED = 1, EV_COMPLETED = 2, EV_ABORTED = 3 };

inline void kahan_add(float v, float &s, float &c) {
  float y = v - c;
  float t = s + y;
  c = (t - s) - y;
  s = t;
}

// int32 wraparound semantics like jax (C signed overflow is UB).
inline int32_t mul_i32(int32_t a, int32_t b) {
  return (int32_t)((uint32_t)a * (uint32_t)b);
}
inline int32_t sub_i32(int32_t a, int32_t b) {
  return (int32_t)((uint32_t)a - (uint32_t)b);
}
inline int32_t add_i32(int32_t a, int32_t b) {
  return (int32_t)((uint32_t)a + (uint32_t)b);
}

}  // namespace

extern "C" {

int fvad_fsm_abi_version() { return 1; }

// Exact Kahan left-fold seed of each stream's ring: sums[b], comps[b].
void fvad_fsm_kahan_seed(const float *buf, float *sums, float *comps,
                         int64_t n_streams, int64_t n_slots) {
#ifdef _OPENMP
#pragma omp parallel for schedule(static) if (n_streams * n_slots > 1 << 16)
#endif
  for (int64_t b = 0; b < n_streams; ++b) {
    float s = 0.0f, c = 0.0f;
    const float *row = buf + b * n_slots;
    for (int64_t i = 0; i < n_slots; ++i) kahan_add(row[i], s, c);
    sums[b] = s;
    comps[b] = c;
  }
}

// Scan B independent machines over W windows each (fsm.step_window
// semantics; see file header).  Per-stream parameter arrays have length B.
void fvad_fsm_scan(
    int64_t n_streams, int64_t n_windows,
    // static shape
    int32_t long_window, int32_t short_window, int32_t ratio_window,
    int32_t has_initial_avg, int32_t fft_size, int32_t sample_rate,
    float window_sec,
    // per-stream params [B]
    const float *threshold_factor, const float *ratio_threshold,
    const int32_t *min_consecutive_samples, const int32_t *max_gap_samples,
    const float *min_duration_sec,
    // inputs [B, W] (+ win_base [B])
    const float *min_volumes, const float *volume_ratios,
    const uint8_t *valids, const int32_t *win_base,
    // carry, mutated in place
    float *long_buf,   // [B, L]
    float *short_buf,  // [B, S]
    float *ratio_buf,  // [B, R]
    int32_t *ireg,     // [B, NI]
    float *freg,       // [B, NF]
    float *kahan,      // [B, NK]
    // outputs [B, W]
    int32_t *event, int32_t *event_win, uint8_t *seg_valid,
    int32_t *seg_start, int32_t *seg_end, float *seg_ratio, float *seg_met) {
  const float sr = (float)sample_rate;
  const float fftf = (float)fft_size;

  // Streams are independent machines — decode them across cores. Numerics
  // are untouched (no cross-stream reductions). The threshold keeps small
  // decodes single-threaded (thread spin-up costs more than the work).
#ifdef _OPENMP
#pragma omp parallel for schedule(static) if (n_streams * n_windows > 1 << 14)
#endif
  for (int64_t b = 0; b < n_streams; ++b) {
    float *lbuf = long_buf + b * long_window;
    float *sbuf = short_buf + b * short_window;
    float *rbuf = ratio_buf + b * ratio_window;
    int32_t *ir = ireg + b * NI;
    float *fr = freg + b * NF;
    float *ks = kahan + b * NK;

    const float tf = threshold_factor[b];
    const float rth = ratio_threshold[b];
    const int32_t min_consec = min_consecutive_samples[b];
    const int32_t max_gap = max_gap_samples[b];
    const float min_dur = min_duration_sec[b];

    int32_t long_idx = ir[I_LONG_IDX], long_cnt = ir[I_LONG_CNT];
    int32_t short_idx = ir[I_SHORT_IDX], short_cnt = ir[I_SHORT_CNT];
    int32_t ratio_idx = ir[I_RATIO_IDX], ratio_cnt = ir[I_RATIO_CNT];
    int32_t state = ir[I_STATE], start_win = ir[I_START], end_win = ir[I_END];
    int32_t seg_cnt = ir[I_SEG_CNT];
    float long_last = fr[F_LONG_LAST], seg_sum = fr[F_SEG_SUM];
    float met_sec = fr[F_MET_SEC];
    float lsum = ks[0], lcomp = ks[1];
    float ssum = ks[2], scomp = ks[3];
    float rsum = ks[4], rcomp = ks[5];

    const float *mv_row = min_volumes + b * n_windows;
    const float *vr_row = volume_ratios + b * n_windows;
    const uint8_t *va_row = valids + b * n_windows;
    const int32_t wb = win_base[b];

    for (int64_t w = 0; w < n_windows; ++w) {
      const int64_t o = b * n_windows + w;
      if (!va_row[w]) {
        // Inert outputs from the frozen carry (matches the masked scan
        // path / kernel stores for invalid windows).
        event[o] = EV_NONE;
        event_win[o] = 0;
        seg_valid[o] = 0;
        seg_start[o] = start_win;
        seg_end[o] = end_win;
        seg_ratio[o] = seg_sum / (float)std::max(seg_cnt, 1);
        seg_met[o] = met_sec;
        continue;
      }
      const float mv = mv_row[w];
      const float vr = vr_row[w];
      const int32_t win_idx = add_i32(wb, (int32_t)w);

      // --- rolling averages (RollingAverage.zig push/avg) ---
      kahan_add(mv - sbuf[short_idx], ssum, scomp);
      sbuf[short_idx] = mv;
      short_idx = (short_idx + 1) % short_window;
      short_cnt = std::min(short_cnt + 1, short_window);
      const float short_avg = ssum / (float)short_cnt;

      kahan_add(vr - rbuf[ratio_idx], rsum, rcomp);
      rbuf[ratio_idx] = vr;
      ratio_idx = (ratio_idx + 1) % ratio_window;
      ratio_cnt = std::min(ratio_cnt + 1, ratio_window);
      const float ratio_avg = rsum / (float)ratio_cnt;

      const float base =
          has_initial_avg ? long_last : (long_cnt > 0 ? long_last : short_avg);
      const bool met = (short_avg > base * tf) && (ratio_avg > rth);

      // long-term only advances when the threshold is NOT met
      // (VADMachine.zig:176-178)
      if (!met) {
        kahan_add(mv - lbuf[long_idx], lsum, lcomp);
        lbuf[long_idx] = mv;
        long_idx = (long_idx + 1) % long_window;
        long_cnt = std::min(long_cnt + 1, long_window);
        long_last = lsum / (float)long_cnt;
      }

      // --- state machine (entry-state transitions) ---
      const bool is_closed = state == CLOSED;
      const bool is_opening = state == OPENING;
      const bool is_open = state == OPEN;
      const bool is_closing = state == CLOSING;

      const bool opening_dur =
          mul_i32(sub_i32(win_idx, start_win), fft_size) >= min_consec;
      const bool closing_dur =
          mul_i32(sub_i32(win_idx, end_win), fft_size) >= max_gap;

      const bool t_closed_opening = is_closed && met;
      const bool t_opening_open = is_opening && met && opening_dur;
      const bool t_open_closing = is_open && !met;
      const bool t_closing_closed = is_closing && !met && closing_dur;

      const float length_sec = ((float)sub_i32(end_win, start_win) * fftf) / sr;
      const bool duration_met = length_sec >= min_dur;
      const bool seg_emitted = t_closing_closed && duration_met;
      const float avg_ratio = seg_sum / (float)std::max(seg_cnt, 1);

      int32_t ev = EV_NONE;
      if (t_opening_open) ev = EV_STARTED;
      if (seg_emitted) ev = EV_COMPLETED;
      if (t_closing_closed && !duration_met) ev = EV_ABORTED;

      event[o] = ev;
      // STARTED payload is the segment's start window (set at the
      // closed->opening transition), not the current window.
      event_win[o] =
          ev == EV_STARTED ? start_win : (ev == EV_COMPLETED ? end_win : 0);
      seg_valid[o] = seg_emitted ? 1 : 0;
      seg_start[o] = start_win;
      seg_end[o] = end_win;
      seg_ratio[o] = avg_ratio;
      seg_met[o] = met_sec;

      // --- per-segment stats (trackSpeechStats, from entry state) ---
      if (t_closed_opening) {
        seg_sum = vr;
        seg_cnt = 1;
        met_sec = window_sec;
      }
      if (is_open) {
        seg_sum = seg_sum + vr;
        seg_cnt = seg_cnt + 1;
        if (met) met_sec = met_sec + window_sec;
      }

      // --- transitions ---
      if (t_closed_opening) {
        state = OPENING;
        start_win = win_idx;
      } else if (is_opening) {
        state = met ? (opening_dur ? OPEN : OPENING) : CLOSED;
      } else if (t_open_closing) {
        state = CLOSING;
        end_win = win_idx;
      } else if (is_closing) {
        state = met ? OPEN : (closing_dur ? CLOSED : CLOSING);
      }
    }

    ir[I_LONG_IDX] = long_idx;
    ir[I_LONG_CNT] = long_cnt;
    ir[I_SHORT_IDX] = short_idx;
    ir[I_SHORT_CNT] = short_cnt;
    ir[I_RATIO_IDX] = ratio_idx;
    ir[I_RATIO_CNT] = ratio_cnt;
    ir[I_STATE] = state;
    ir[I_START] = start_win;
    ir[I_END] = end_win;
    ir[I_SEG_CNT] = seg_cnt;
    fr[F_LONG_LAST] = long_last;
    fr[F_SEG_SUM] = seg_sum;
    fr[F_MET_SEC] = met_sec;
    ks[0] = lsum;
    ks[1] = lcomp;
    ks[2] = ssum;
    ks[3] = scomp;
    ks[4] = rsum;
    ks[5] = rcomp;
  }
}

}  // extern "C"
