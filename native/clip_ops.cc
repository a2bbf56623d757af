// Native host-side clip preprocessing for the picad_tpu input pipeline.
//
// The reference's per-sample work (datasets/ucf_dataloader.py:162-175)
// is a python loop: crop -> cv2.resize -> /255 -> per-frame mask
// threshold -> a full-copy horizontal flip.  This library fuses the
// whole sample assembly into one cache-friendly pass over the decoded
// uint8 video: crop + normalize + flip are produced together per row,
// so the frame is touched once instead of four times.
//
// Exposed as a plain C ABI, loaded via ctypes (picad_tpu/data/_native.py).
// Compile: make -C native   (g++ -O3 -shared -fPIC)

#include <cstdint>
#include <cstring>

extern "C" {

// Assemble one training sample from a decoded video.
//
//   video:  (F, H, W, 3) uint8, frame-major contiguous
//   mask:   (F, H, W, 1) uint8 box/puppet heat map (may be null)
//   span:   frame indices to gather (depth entries)
//   valid:  per-output-frame validity flags (depth entries; JHMDB's
//           mask_cls rule — pass all-ones for UCF)
//   y0, x0: crop origin; ch, cw: crop size
//
// Outputs (all float32, contiguous):
//   out      (depth, ch, cw, 3)  = video[span][crop] / 255
//   out_flip (depth, ch, cw, 3)  = horizontal flip of out
//   out_mask (depth, ch, cw, 1)  = (mask[span][crop] > 0) & valid
void assemble_clip(const uint8_t* video, const uint8_t* mask,
                   int64_t H, int64_t W,
                   const int64_t* span, const uint8_t* valid, int64_t depth,
                   int64_t y0, int64_t x0, int64_t ch, int64_t cw,
                   float* out, float* out_flip, float* out_mask) {
  const float inv255 = 1.0f / 255.0f;
  for (int64_t j = 0; j < depth; ++j) {
    const int64_t f = span[j];
    const uint8_t* vframe = video + ((f * H + y0) * W + x0) * 3;
    float* orow = out + j * ch * cw * 3;
    float* frow = out_flip + j * ch * cw * 3;
    for (int64_t r = 0; r < ch; ++r) {
      const uint8_t* src = vframe + r * W * 3;
      float* dst = orow + r * cw * 3;
      float* fdst = frow + r * cw * 3;
      // straight conversion first (auto-vectorizes: u8 -> f32 * inv255)
      const int64_t n = cw * 3;
      for (int64_t c = 0; c < n; ++c) dst[c] = src[c] * inv255;
      // flip as a cache-hot reverse copy of the float row
      for (int64_t c = 0; c < cw; ++c) {
        const float* s = dst + c * 3;
        float* fd = fdst + (cw - 1 - c) * 3;
        fd[0] = s[0];
        fd[1] = s[1];
        fd[2] = s[2];
      }
    }
    float* mrow = out_mask + j * ch * cw;
    if (mask != nullptr && valid[j]) {
      const uint8_t* mframe = mask + (f * H + y0) * W + x0;
      for (int64_t r = 0; r < ch; ++r) {
        const uint8_t* src = mframe + r * W;
        float* dst = mrow + r * cw;
        for (int64_t c = 0; c < cw; ++c) dst[c] = src[c] > 0 ? 1.0f : 0.0f;
      }
    } else {
      std::memset(mrow, 0, sizeof(float) * ch * cw);
    }
  }
}

// uint8 crop-gather for the TPU-first `device_prep` sample layout
// (picad_tpu/data/dataset.py): /255, flip and the mask-float conversion
// all happen on device inside the jitted step, so the host's only work
// is gathering the 8 cropped frames and thresholding the mask — done
// here as row memcpys straight into one slot of the PREALLOCATED batch
// arrays (no per-sample allocation, no collate/stack, no permute copy).
// Called through ctypes, which releases the GIL for the duration: batch
// assembly overlaps the main thread's step dispatch on a 1-core host.
//
//   video:    (F, H, W, 3) uint8 contiguous
//   mask:     (F, H, W, 1) uint8 (may be null)
//   span:     depth frame indices
//   valid:    per-frame validity (JHMDB mask_cls rule; all-ones for UCF)
//   out_data: (depth, ch, cw, 3) uint8 slot = video[span][crop]
//   out_mask: (depth, ch, cw, 1) uint8 slot = (mask[span][crop] > 0) & valid
void crop_gather_u8(const uint8_t* video, const uint8_t* mask,
                    int64_t H, int64_t W,
                    const int64_t* span, const uint8_t* valid, int64_t depth,
                    int64_t y0, int64_t x0, int64_t ch, int64_t cw,
                    uint8_t* out_data, uint8_t* out_mask) {
  for (int64_t j = 0; j < depth; ++j) {
    const int64_t f = span[j];
    const uint8_t* vframe = video + ((f * H + y0) * W + x0) * 3;
    uint8_t* dst = out_data + j * ch * cw * 3;
    for (int64_t r = 0; r < ch; ++r)
      std::memcpy(dst + r * cw * 3, vframe + r * W * 3, (size_t)(cw * 3));
    uint8_t* mdst = out_mask + j * ch * cw;
    if (mask != nullptr && valid[j]) {
      const uint8_t* mframe = mask + (f * H + y0) * W + x0;
      for (int64_t r = 0; r < ch; ++r) {
        const uint8_t* src = mframe + r * W;
        uint8_t* d = mdst + r * cw;
        for (int64_t c = 0; c < cw; ++c) d[c] = src[c] > 0 ? 1 : 0;
      }
    } else {
      std::memset(mdst, 0, (size_t)(ch * cw));
    }
  }
}

// Union-of-boxes rasterization (datasets/ucf_dataloader.py:215-222):
// paint n_boxes (frame, x, y, w, h) rows into a (F, H, W) uint8 volume.
void rasterize_boxes(uint8_t* mask, int64_t F, int64_t H, int64_t W,
                     const int64_t* boxes, int64_t n_boxes) {
  for (int64_t i = 0; i < n_boxes; ++i) {
    const int64_t f = boxes[i * 5 + 0];
    if (f < 0 || f >= F) continue;
    int64_t x = boxes[i * 5 + 1], y = boxes[i * 5 + 2];
    int64_t w = boxes[i * 5 + 3], h = boxes[i * 5 + 4];
    if (x < 0) { w += x; x = 0; }
    if (y < 0) { h += y; y = 0; }
    if (x + w > W) w = W - x;
    if (y + h > H) h = H - y;
    uint8_t* frame = mask + f * H * W;
    for (int64_t r = y; r < y + h && r >= 0; ++r)
      std::memset(frame + r * W + x, 1, (size_t)(w > 0 ? w : 0));
  }
}

}  // extern "C"
