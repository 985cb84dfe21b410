// Native helpers for yolact_tpu: COCO RLE codec + greedy NMS.
#include <algorithm>
//
// TPU-native replacement for the reference's host-side native components:
// the Cython NMS (/root/reference/utils/cython_nms.pyx — greedy O(n^2)
// suppression used by traditional_nms) and the pycocotools maskApi RLE codec
// the COCO data pipeline depends on.  Exposed as a plain C ABI consumed via
// ctypes (no pybind11 in this image).

#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// RLE codec: COCO compressed counts (base-32 varint, 5 data bits per char,
// offset 48, counts[i>2] delta-coded against counts[i-2]).
// ---------------------------------------------------------------------------

// Encode `n` run lengths into `out` (caller allocates >= 8*n bytes).
// Returns number of bytes written.
int64_t rle_encode_counts(const int64_t* counts, int64_t n, char* out) {
  int64_t p = 0;
  for (int64_t i = 0; i < n; i++) {
    int64_t x = counts[i];
    if (i > 2) x -= counts[i - 2];
    bool more = true;
    while (more) {
      char c = x & 0x1f;
      x >>= 5;
      more = (c & 0x10) ? (x != -1) : (x != 0);
      if (more) c |= 0x20;
      c += 48;
      out[p++] = c;
    }
  }
  return p;
}

// Decode a compressed counts string of `n` bytes into `out`
// (caller allocates >= n entries).  Returns number of counts.
int64_t rle_decode_counts(const char* s, int64_t n, uint32_t* out) {
  int64_t m = 0, p = 0;
  while (p < n) {
    int64_t x = 0;
    int64_t k = 0;
    bool more = true;
    while (more) {
      char c = s[p] - 48;
      x |= (int64_t)(c & 0x1f) << (5 * k);
      more = (c & 0x20) != 0;
      p++;
      k++;
      if (!more && (c & 0x10)) x |= ~((int64_t)0) << (5 * k);
    }
    if (m > 2) x += out[m - 2];
    out[m++] = (uint32_t)x;
  }
  return m;
}

// Decode counts straight into a column-major byte mask of h*w pixels.
// Returns 0 on success, -1 if the runs overflowed the mask (the mask is
// still filled with the clamped runs; pycocotools raises in this case,
// so the Python wrapper surfaces the -1 as an error).
int32_t rle_decode_mask(const char* s, int64_t n, int64_t h, int64_t w,
                        uint8_t* mask) {
  std::vector<uint32_t> counts(n + 1);
  int64_t m = rle_decode_counts(s, n, counts.data());
  int64_t pos = 0, total = h * w;
  uint8_t v = 0;
  int32_t rc = 0;
  for (int64_t i = 0; i < m; i++) {
    int64_t run = counts[i];
    if (pos + run > total) {
      run = total - pos;
      rc = -1;  // annotation runs exceed h*w (corrupt or swapped dims)
    }
    if (run > 0) memset(mask + pos, v, run);
    pos += run;
    v = 1 - v;
  }
  if (pos < total) memset(mask + pos, 0, total - pos);
  return rc;
}

// ---------------------------------------------------------------------------
// Greedy NMS over [n, 5] dets (x1, y1, x2, y2, score), pre-sorted or not.
// Semantics match utils/cython_nms.pyx:24-74: iterate in score order,
// suppress boxes with IoU > thresh against any kept box.  Areas use the
// +1 convention of the Cython original.
// ---------------------------------------------------------------------------
int64_t greedy_nms(const float* dets, int64_t n, float thresh,
                   int64_t* keep_out) {
  std::vector<int64_t> order(n);
  for (int64_t i = 0; i < n; i++) order[i] = i;
  // stable sort by descending score
  std::vector<float> scores(n);
  for (int64_t i = 0; i < n; i++) scores[i] = dets[i * 5 + 4];
  std::stable_sort(order.begin(), order.end(),
                   [&](int64_t a, int64_t b) { return scores[a] > scores[b]; });

  std::vector<float> areas(n);
  for (int64_t i = 0; i < n; i++) {
    const float* d = dets + i * 5;
    areas[i] = (d[2] - d[0] + 1) * (d[3] - d[1] + 1);
  }

  std::vector<uint8_t> suppressed(n, 0);
  int64_t n_keep = 0;
  for (int64_t oi = 0; oi < n; oi++) {
    int64_t i = order[oi];
    if (suppressed[i]) continue;
    keep_out[n_keep++] = i;
    const float* di = dets + i * 5;
    for (int64_t oj = oi + 1; oj < n; oj++) {
      int64_t j = order[oj];
      if (suppressed[j]) continue;
      const float* dj = dets + j * 5;
      float xx1 = di[0] > dj[0] ? di[0] : dj[0];
      float yy1 = di[1] > dj[1] ? di[1] : dj[1];
      float xx2 = di[2] < dj[2] ? di[2] : dj[2];
      float yy2 = di[3] < dj[3] ? di[3] : dj[3];
      float iw = xx2 - xx1 + 1;
      float ih = yy2 - yy1 + 1;
      if (iw > 0 && ih > 0) {
        float inter = iw * ih;
        float ovr = inter / (areas[i] + areas[j] - inter);
        if (ovr >= thresh) suppressed[j] = 1;
      }
    }
  }
  return n_keep;
}

}  // extern "C"
