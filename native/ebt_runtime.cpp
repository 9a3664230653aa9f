// Native runtime for event_based_bos_tpu: host-side event-stream kernels.
//
// The reference implementation keeps the whole HDF5 stream in RAM and slices
// it with numpy (src/data_loader/ccs.py:199-297), filters events in pure
// Python loops (src/utils/event_filters.py:46-128), and has no .raw decoder
// (OPENEB_ENABLED = False, ccs.py:19-20).  This library provides the
// TPU-framework's host runtime for those paths:
//
//   * binary search over the (sorted) timestamp stream,
//   * padded fixed-capacity window extraction (struct-of-arrays float32 with
//     the reference's x/y swap and µs→s conversion) feeding static-shape
//     device buffers,
//   * the exact sequential Background Activity Filter (Delbrück 2008) and
//     hot-pixel filter at memory speed,
//   * a Prophesee EVT3 .raw decoder (the reference requires offline
//     conversion to HDF5; here .raw loads directly).
//
// Exposed with a plain C ABI for ctypes (no pybind11 in this image).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Binary search: index of the first element >= query (numpy searchsorted
// 'left'), over int32 microsecond timestamps.
// ---------------------------------------------------------------------------
int64_t ebt_searchsorted_i32(const int32_t* t, int64_t n, int32_t query) {
  return std::lower_bound(t, t + n, query) - t;
}

int64_t ebt_searchsorted_f64(const double* t, int64_t n, double query) {
  return std::lower_bound(t, t + n, query) - t;
}

// ---------------------------------------------------------------------------
// Padded window extraction.
//
// Inputs are the raw HDF5 arrays (x: sensor-x int16 = width direction,
// y: sensor-y int16 = height, t: int32 µs, p: uint8 {0,1}).  Output is the
// framework SoA: out_x = row = sensor y, out_y = col = sensor x (the swap the
// reference does at ccs.py:293-296), t in seconds, p passed through, valid
// flag 1 for the first (i1-i0) slots.  Returns the number of live events.
// ---------------------------------------------------------------------------
int64_t ebt_window_padded(const int16_t* x, const int16_t* y,
                          const int32_t* t, const uint8_t* p,
                          int64_t i0, int64_t i1, int64_t capacity,
                          float* out_x, float* out_y, float* out_t,
                          float* out_p, uint8_t* out_valid) {
  const int64_t n = std::min(i1 - i0, capacity);
  for (int64_t i = 0; i < n; ++i) {
    out_x[i] = static_cast<float>(y[i0 + i]);
    out_y[i] = static_cast<float>(x[i0 + i]);
    out_t[i] = static_cast<float>(t[i0 + i]) * 1e-6f;
    out_p[i] = static_cast<float>(p[i0 + i]);
    out_valid[i] = 1;
  }
  if (n < capacity) {
    std::memset(out_x + n, 0, sizeof(float) * (capacity - n));
    std::memset(out_y + n, 0, sizeof(float) * (capacity - n));
    std::memset(out_t + n, 0, sizeof(float) * (capacity - n));
    std::memset(out_p + n, 0, sizeof(float) * (capacity - n));
    std::memset(out_valid + n, 0, sizeof(uint8_t) * (capacity - n));
  }
  return n;
}

// ---------------------------------------------------------------------------
// Exact Background Activity Filter (reference semantics,
// event_filters.py:46-97): per event, write its timestamp into the per-pixel
// latest-time map, then keep it iff the (num_support+1)-th most recent
// timestamp in the (2k+1)^2 neighbourhood is younger than dt.
//
// events: float64 rows (x=row, y=col, t sec, p); keep: out uint8 mask;
// time_map: HxW float64 scratch, carried across calls for the continuous
// variant (pass zeros to reset).
// ---------------------------------------------------------------------------
void ebt_baf_filter(const double* ev, int64_t n, int64_t h, int64_t w,
                    double dt, int64_t ksize, int64_t num_support,
                    double* time_map, uint8_t* keep) {
  std::vector<double> window;
  window.reserve((2 * ksize + 1) * (2 * ksize + 1));
  for (int64_t i = 0; i < n; ++i) {
    const double* e = ev + 4 * i;
    int64_t x = static_cast<int64_t>(e[0]);
    int64_t y = static_cast<int64_t>(e[1]);
    const double ts = e[2];
    if (x < 0) x = 0;
    if (x >= h) x = h - 1;
    if (y < 0) y = 0;
    if (y >= w) y = w - 1;
    double& cell = time_map[x * w + y];
    cell = std::max(cell, ts);
    const int64_t x0 = std::max<int64_t>(0, x - ksize);
    const int64_t x1 = std::min<int64_t>(h, x + ksize + 1);
    const int64_t y0 = std::max<int64_t>(0, y - ksize);
    const int64_t y1 = std::min<int64_t>(w, y + ksize + 1);
    window.clear();
    for (int64_t r = x0; r < x1; ++r)
      for (int64_t c = y0; c < y1; ++c) window.push_back(time_map[r * w + c]);
    // (num_support+1)-th largest
    const int64_t k = std::min<int64_t>(num_support, (int64_t)window.size() - 1);
    std::nth_element(window.begin(), window.begin() + k, window.end(),
                     std::greater<double>());
    const double last = window[k];
    keep[i] = (ts - last) < dt ? 1 : 0;
  }
}

// ---------------------------------------------------------------------------
// Hot-pixel filter: per-pixel integer event counts, then a keep mask for
// events on pixels whose count <= threshold (reference semantics threshold
// on the bilinear IWE at integer positions, event_filters.py:100-128).
// count: HxW int32 scratch (zeroed by caller).
// ---------------------------------------------------------------------------
void ebt_hot_pixel_filter(const double* ev, int64_t n, int64_t h, int64_t w,
                          double thresh, int32_t* count, uint8_t* keep) {
  for (int64_t i = 0; i < n; ++i) {
    const double* e = ev + 4 * i;
    int64_t x = static_cast<int64_t>(e[0]);
    int64_t y = static_cast<int64_t>(e[1]);
    if (x < 0 || x >= h || y < 0 || y >= w) continue;
    ++count[x * w + y];
  }
  for (int64_t i = 0; i < n; ++i) {
    const double* e = ev + 4 * i;
    int64_t x = static_cast<int64_t>(e[0]);
    int64_t y = static_cast<int64_t>(e[1]);
    if (x < 0 || x >= h || y < 0 || y >= w) {
      keep[i] = 1;
      continue;
    }
    keep[i] = count[x * w + y] <= thresh ? 1 : 0;
  }
}

// ---------------------------------------------------------------------------
// Prophesee EVT3 decoder.
//
// 16-bit little-endian words; event types in bits 15..12:
//   0x0 EVT_ADDR_Y   — y in bits 10..0
//   0x2 EVT_ADDR_X   — x in bits 10..0, polarity in bit 11 (single event)
//   0x3 VECT_BASE_X  — base x in bits 10..0, polarity bit 11
//   0x4 VECT_12      — 12 valid bits, events at base_x..base_x+11
//   0x5 VECT_8       — 8 valid bits
//   0x6 EVT_TIME_LOW — time bits 11..0
//   0x8 EVT_TIME_HIGH— time bits 23..12
// Returns the number of decoded events (<= capacity); outputs are the raw
// sensor coordinates (x = width, y = height), t µs, p {0,1} — i.e. the same
// layout as the reference's HDF5 conversion.
// ---------------------------------------------------------------------------
int64_t ebt_decode_evt3(const uint16_t* words, int64_t n_words,
                        int64_t capacity, int16_t* out_x, int16_t* out_y,
                        int32_t* out_t, uint8_t* out_p) {
  int64_t cnt = 0;
  uint32_t time_high = 0, time_low = 0;
  bool have_high = false;
  int32_t cur_y = 0;
  int32_t base_x = 0;
  uint8_t pol = 0;
  for (int64_t i = 0; i < n_words && cnt < capacity; ++i) {
    const uint16_t wrd = words[i];
    const uint16_t type = wrd >> 12;
    switch (type) {
      case 0x0:  // ADDR_Y
        cur_y = wrd & 0x07FF;
        break;
      case 0x2: {  // ADDR_X: one event
        const int32_t x = wrd & 0x07FF;
        pol = (wrd >> 11) & 1;
        out_x[cnt] = static_cast<int16_t>(x);
        out_y[cnt] = static_cast<int16_t>(cur_y);
        out_t[cnt] = static_cast<int32_t>((time_high << 12) | time_low);
        out_p[cnt] = pol;
        ++cnt;
        break;
      }
      case 0x3:  // VECT_BASE_X
        base_x = wrd & 0x07FF;
        pol = (wrd >> 11) & 1;
        break;
      case 0x4:    // VECT_12
      case 0x5: {  // VECT_8
        const int bits = (type == 0x4) ? 12 : 8;
        const uint16_t mask_bits = wrd & ((1u << bits) - 1u);
        for (int b = 0; b < bits && cnt < capacity; ++b) {
          if (mask_bits & (1u << b)) {
            out_x[cnt] = static_cast<int16_t>(base_x + b);
            out_y[cnt] = static_cast<int16_t>(cur_y);
            out_t[cnt] = static_cast<int32_t>((time_high << 12) | time_low);
            out_p[cnt] = pol;
            ++cnt;
          }
        }
        base_x += bits;
        break;
      }
      case 0x6:  // TIME_LOW
        time_low = wrd & 0x0FFF;
        break;
      case 0x8:  // TIME_HIGH
      {
        const uint32_t th = wrd & 0x0FFF;
        if (have_high && th < (time_high & 0x0FFF)) {
          // 12-bit wrap of the high counter: extend (rare for short files)
          time_high = ((time_high >> 12) + 1) << 12 | th;
        } else {
          time_high = (time_high & ~0x0FFFu) | th;
        }
        have_high = true;
        break;
      }
      default:
        break;  // EXT_TRIGGER / OTHERS / CONTINUED — ignored
    }
  }
  return cnt;
}

}  // extern "C"
