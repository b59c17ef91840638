// Native host-side image preprocessing for the data pipeline.
//
// The reference does all image work in Python via PIL/torchvision
// (datasets.py:86-115 get_imgs: bbox crop -> Scale -> RandomCrop -> HFlip ->
// per-branch Resize -> Normalize).  This library implements the same
// pipeline as fused, multithreaded C++ over interleaved RGB buffers so the
// host can keep a TPU fed: one call per sample produces the whole
// CLIP-normalized float32 pyramid without intermediate Python objects.
//
// The image math (taps/resize/normalize/pyramid) lives in image_core.h,
// shared with the async decode+prefetch executor (image_exec.cc).
//
// Build: g++ -O3 -shared -fPIC -fopenmp image_ops.cc -o libt2igan_image.so
// (done automatically by t2igan/native/__init__.py).

#include "image_core.h"

extern "C" {

// Resize interleaved RGB uint8 (sh x sw) to float32 [0,255] (dh x dw).
void t2i_resize_rgb(const uint8_t* src, int sh, int sw, float* dst, int dh,
                    int dw) {
  t2i::resize_rgb(src, sh, sw, dst, dh, dw);
}

// Full per-sample pipeline (see image_core.h::pyramid_from_rgb).
int t2i_pyramid(const uint8_t* src, int sh, int sw, int scale_size, int crop,
                int crop_x, int crop_y, int flip, const int* branch_sizes,
                int n_branches, float** outs, const float* mean,
                const float* stdv) {
  return t2i::pyramid_from_rgb(src, sh, sw, scale_size, crop, crop_x, crop_y,
                               flip, branch_sizes, n_branches, outs, mean,
                               stdv);
}

// Batched pyramid over `n` samples (parallel across samples with OpenMP).
// srcs/heights/widths/crop_xs/crop_ys/flips are per-sample; outs is
// [n * n_branches] pointers ordered sample-major.
int t2i_pyramid_batch(const uint8_t** srcs, const int* heights,
                      const int* widths, int scale_size, int crop,
                      const int* crop_xs, const int* crop_ys,
                      const int* flips, const int* branch_sizes,
                      int n_branches, float** outs, const float* mean,
                      const float* stdv, int n) {
  int err = 0;
#pragma omp parallel for schedule(dynamic)
  for (int i = 0; i < n; ++i) {
    int e = t2i::pyramid_from_rgb(
        srcs[i], heights[i], widths[i], scale_size, crop, crop_xs[i],
        crop_ys[i], flips[i], branch_sizes, n_branches,
        outs + static_cast<size_t>(i) * n_branches, mean, stdv);
#pragma omp critical
    err |= e;
  }
  return err;
}

}  // extern "C"
