// ssl_tpu native host-pipeline kernels (C++17, no external deps).
//
// The TPU compute path is JAX/XLA/Pallas; this library accelerates the
// *host-side* input pipeline that feeds it (SURVEY §2.8/§3.2: the reference
// burns GPU time on degradation under no_grad — here the host does it, and
// these kernels keep the host from becoming the bottleneck):
//   - jpeg_roundtrip: 8x8 DCT quantization round-trip (DiffJPEG math,
//     ITU-T T.81 Annex K tables), the heaviest op in the two-stage degrader
//   - filter2d_reflect: reflect-101 padded 2-D convolution (blur kernels)
//   - box_ssd_ssg: golden CPU evaluation of the SSG windowed-SSD definition
//     (cross-checks the Pallas/XLA kernels from native code)
//
// Built as a plain shared library; Python binds via ctypes (build.py).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <algorithm>
#include <thread>
#include <vector>

extern "C" {

// transposed vs Annex K, matching the reference DiffJPEG's y_table.T
// convention relative to its block/DCT orientation (ops/diffjpeg.py)
static const float kYTable[64] = {
    16, 12, 14, 14, 18, 24, 49, 72, 11, 12, 13, 17, 22, 35, 64, 92,
    10, 14, 16, 22, 37, 55, 78, 95, 16, 19, 24, 29, 56, 64, 87, 98,
    24, 26, 40, 51, 68, 81, 103, 112, 40, 58, 57, 87, 109, 104, 121, 100,
    51, 60, 69, 80, 103, 113, 120, 103, 61, 55, 56, 62, 77, 92, 101, 99};
static const float kCTable[64] = {
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99};

static float gDct[64];
static bool gDctInit = false;

static void init_dct() {
  if (gDctInit) return;
  for (int k = 0; k < 8; ++k) {
    double s = (k == 0) ? std::sqrt(1.0 / 8.0) : std::sqrt(2.0 / 8.0);
    for (int n = 0; n < 8; ++n)
      gDct[k * 8 + n] = (float)(s * std::cos((2 * n + 1) * k * M_PI / 16.0));
  }
  gDctInit = true;
}

// 8x8 block: out = D * in * D^T (fwd) or D^T * in * D (inv)
static void dct8x8(const float* in, float* out, bool inverse) {
  float tmp[64];
  for (int i = 0; i < 8; ++i)
    for (int j = 0; j < 8; ++j) {
      float acc = 0;
      for (int k = 0; k < 8; ++k)
        acc += (inverse ? gDct[k * 8 + i] : gDct[i * 8 + k]) * in[k * 8 + j];
      tmp[i * 8 + j] = acc;
    }
  for (int i = 0; i < 8; ++i)
    for (int j = 0; j < 8; ++j) {
      float acc = 0;
      for (int k = 0; k < 8; ++k)
        acc += tmp[i * 8 + k] * (inverse ? gDct[k * 8 + j] : gDct[j * 8 + k]);
      out[i * 8 + j] = acc;
    }
}

static void jpeg_channel(float* chan, int h, int w, const float* table, float factor) {
  init_dct();
  float q[64];
  // raw table*factor scaling, matching the reference DiffJPEG (y_quantize
  // does NOT apply libjpeg's floor+clip table rounding)
  for (int i = 0; i < 64; ++i) q[i] = table[i] * factor;
  std::vector<float> block(64), coef(64);
  for (int by = 0; by < h / 8; ++by)
    for (int bx = 0; bx < w / 8; ++bx) {
      for (int i = 0; i < 8; ++i)
        for (int j = 0; j < 8; ++j)
          block[i * 8 + j] = chan[(by * 8 + i) * w + bx * 8 + j] - 128.0f;
      dct8x8(block.data(), coef.data(), false);
      for (int i = 0; i < 64; ++i) coef[i] = std::round(coef[i] / q[i]) * q[i];
      dct8x8(coef.data(), block.data(), true);
      for (int i = 0; i < 8; ++i)
        for (int j = 0; j < 8; ++j)
          chan[(by * 8 + i) * w + bx * 8 + j] = block[i * 8 + j] + 128.0f;
    }
}

// img: HWC RGB float32 [0,1], h/w multiples of 16. In-place round-trip.
void jpeg_roundtrip(float* img, int h, int w, float quality) {
  float factor = ((quality < 50.0f) ? 5000.0f / quality : 200.0f - quality * 2.0f) / 100.0f;
  std::vector<float> y(h * w), cb(h * w / 4), cr(h * w / 4);
  std::vector<float> cbf(h * w), crf(h * w);
  for (int i = 0; i < h * w; ++i) {
    float r = img[i * 3] * 255.f, g = img[i * 3 + 1] * 255.f, b = img[i * 3 + 2] * 255.f;
    y[i] = 0.299f * r + 0.587f * g + 0.114f * b;
    cbf[i] = -0.168736f * r - 0.331264f * g + 0.5f * b + 128.f;
    crf[i] = 0.5f * r - 0.418688f * g - 0.081312f * b + 128.f;
  }
  int h2 = h / 2, w2 = w / 2;
  for (int i = 0; i < h2; ++i)
    for (int j = 0; j < w2; ++j) {
      cb[i * w2 + j] = 0.25f * (cbf[(2 * i) * w + 2 * j] + cbf[(2 * i) * w + 2 * j + 1] +
                                cbf[(2 * i + 1) * w + 2 * j] + cbf[(2 * i + 1) * w + 2 * j + 1]);
      cr[i * w2 + j] = 0.25f * (crf[(2 * i) * w + 2 * j] + crf[(2 * i) * w + 2 * j + 1] +
                                crf[(2 * i + 1) * w + 2 * j] + crf[(2 * i + 1) * w + 2 * j + 1]);
    }
  jpeg_channel(y.data(), h, w, kYTable, factor);
  jpeg_channel(cb.data(), h2, w2, kCTable, factor);
  jpeg_channel(cr.data(), h2, w2, kCTable, factor);
  for (int i = 0; i < h; ++i)
    for (int j = 0; j < w; ++j) {
      float yy = y[i * w + j];
      float cbv = cb[(i / 2) * w2 + j / 2] - 128.f;
      float crv = cr[(i / 2) * w2 + j / 2] - 128.f;
      float r = yy + 1.402f * crv;
      float g = yy - 0.344136f * cbv - 0.714136f * crv;
      float b = yy + 1.772f * cbv;
      float* px = img + (i * w + j) * 3;
      px[0] = std::min(1.f, std::max(0.f, r / 255.f));
      px[1] = std::min(1.f, std::max(0.f, g / 255.f));
      px[2] = std::min(1.f, std::max(0.f, b / 255.f));
    }
}

// batched jpeg with per-item quality, threaded over the batch
void jpeg_roundtrip_batch(float* imgs, int b, int h, int w, const float* qualities,
                          int n_threads) {
  int nt = std::max(1, std::min(n_threads, b));
  std::vector<std::thread> pool;
  int per = (b + nt - 1) / nt;
  for (int t = 0; t < nt; ++t) {
    pool.emplace_back([=]() {
      for (int i = t * per; i < std::min(b, (t + 1) * per); ++i)
        jpeg_roundtrip(imgs + (size_t)i * h * w * 3, h, w, qualities[i]);
    });
  }
  for (auto& th : pool) th.join();
}

static inline int reflect101(int x, int n) {
  if (n == 1) return 0;
  while (x < 0 || x >= n) {
    if (x < 0) x = -x;
    if (x >= n) x = 2 * n - 2 - x;
  }
  return x;
}

// HWC float32 conv with reflect-101 border; kernel k x k.
void filter2d_reflect(const float* img, float* out, int h, int w, int c,
                      const float* kernel, int k) {
  int half = k / 2;
  for (int y = 0; y < h; ++y)
    for (int x = 0; x < w; ++x) {
      for (int ch = 0; ch < c; ++ch) {
        float acc = 0;
        for (int ky = 0; ky < k; ++ky) {
          int sy = reflect101(y + ky - half, h);
          for (int kx = 0; kx < k; ++kx) {
            int sx = reflect101(x + kx - half, w);
            acc += kernel[ky * k + kx] * img[(sy * w + sx) * c + ch];
          }
        }
        out[(y * w + x) * c + ch] = acc;
      }
    }
}

// Golden CPU SSG: for each of `mc` positions, 625-way windowed SSD
// (CUDA-reference semantics: out-of-patch candidate window pixels contribute
// center^2). image: CHW padded by psize/2 reflect already; pos: (mc,2) padded coords.
void box_ssd_ssg(const float* image, const int* pos, float* out, int mc,
                 int psize, int ksize, int height, int width, int channel) {
  int hp = psize / 2, hk = ksize / 2;
  for (int m = 0; m < mc; ++m) {
    int py = pos[2 * m], px = pos[2 * m + 1];
    for (int i = 0; i < psize; ++i)
      for (int j = 0; j < psize; ++j) {
        int dy = i - hp, dx = j - hp;
        double acc = 0;
        for (int ch = 0; ch < channel; ++ch) {
          const float* plane = image + (size_t)ch * height * width;
          for (int ky = -hk; ky <= hk; ++ky)
            for (int kx = -hk; kx <= hk; ++kx) {
              float centerv = plane[(py + ky) * width + px + kx];
              bool inside = (i + ky >= 0 && i + ky < psize && j + kx >= 0 && j + kx < psize);
              float d = inside ? centerv - plane[(py + dy + ky) * width + px + dx + kx]
                               : centerv;
              acc += (double)d * d;
            }
        }
        out[(size_t)m * psize * psize + i * psize + j] = (float)acc;
      }
  }
}

}  // extern "C"
