// Riemersma (Hilbert-curve) error-diffusion dither.
//
// Re-derivation of the reference algorithm (/root/reference/MagickCore/
// quantize.c:1688 RiemersmaDither, :1796 Riemersma, :2046 weights init,
// :2315 PosterizeImage map construction, :1107 ClosestColor, :755
// ClassifyImageColors): the image is traversed along a Hilbert curve of
// order ceil(log2(max(W,H))); each visited pixel is corrected by a
// 16-entry queue of previous quantization errors weighted by an
// exponential decay, clamped, and assigned the color the reference's
// octree search yields.  That search is deliberately LOCAL: descend the
// classification octree along the pixel's 8-bit channel bits until a
// child is missing, back up to the parent, and take the closest (<=,
// ties to last-visited) colormap color within that subtree — which is
// not always the global nearest.  A 6-bit/channel color cache
// (CacheShift=2 on non-Apple builds) makes the first pixel hashed into
// a cell decide for all later ones.  All of
// this is replicated for bit-exactness, and it is host-sequential by
// nature (each step depends on the previous 16 errors), so it lives in
// native code rather than on the TPU.
//
// This file shares no code with the reference; constants and structure
// are re-stated from its published behavior.

#include <cmath>
#include <cstring>
#include <vector>

namespace {

constexpr int kQueue = 16;
constexpr int kDepth = 8;

inline unsigned scale_to_char(double quantum) {
  // ScaleQuantumToChar, Q16 HDRI: (uchar)(q/257.0f + 0.5f), clamped.
  if (!(quantum > 0.0)) return 0;
  float f = (float)quantum / 257.0f;
  if (f >= 255.0f) return 255;
  return (unsigned)(f + 0.5f);
}

struct Node {
  Node *child[16];
  Node *parent;
  int unique = 0;
  int color_number = -1;
  double color[4] = {0, 0, 0, 0};   // colormap entry (quantum units)
  Node() { std::memset(child, 0, sizeof(child)); parent = nullptr; }
};

struct Ctx {
  float *img;          // H*W*C, [0,1]
  long h, w, c;
  int levels;
  double diffusion;
  double err[kQueue][4];    // err[0] = oldest
  double weights[kQueue];   // weights[0] applies to err[0]
  long x, y;
  std::vector<Node *> pool;
  Node *root = nullptr;
  std::vector<double> colormap;   // color_number*4 + ch, quantum units
  std::vector<int> cache;         // 5-bit/channel key -> color_number
  bool use_alpha = false;

  // ClosestColor state
  double target[4];
  double best_distance;
  int best_number;

  ~Ctx() { for (Node *n : pool) delete n; }

  Node *new_node(Node *parent) {
    Node *n = new Node();
    n->parent = parent;
    pool.push_back(n);
    return n;
  }

  unsigned node_id(const unsigned c8[4], int index) const {
    unsigned id = ((c8[0] >> index) & 1u) | (((c8[1] >> index) & 1u) << 1) |
                  (((c8[2] >> index) & 1u) << 2);
    if (use_alpha) id |= ((c8[3] >> index) & 1u) << 3;
    return id;
  }

  void channels8(const double q[4], unsigned c8[4]) const {
    // gray images mirror the gray value into green/blue (the map image
    // is cloned from the input, so a 1-channel input classifies with
    // replicated channels)
    c8[0] = scale_to_char(q[0]);
    c8[1] = scale_to_char(c >= 3 ? q[1] : q[0]);
    c8[2] = scale_to_char(c >= 3 ? q[2] : q[0]);
    c8[3] = use_alpha ? scale_to_char(q[c == 2 ? 1 : 3]) : 0;
  }

  void classify() {
    root = new_node(nullptr);
    long ncolors = 1;
    for (long ch = 0; ch < (use_alpha ? c : (c >= 3 ? 3 : 1)); ch++)
      ncolors *= levels;
    double scale = 65535.0 / (levels - 1.0);
    for (long xcol = 0; xcol < ncolors; xcol++) {
      long rem = xcol;
      double q[4] = {0, 0, 0, 0};
      long nch = use_alpha ? c : (c >= 3 ? 3 : 1);
      for (long ch = 0; ch < nch; ch++) {
        q[ch] = scale * (double)(rem % levels);
        rem /= levels;
      }
      unsigned c8[4];
      channels8(q, c8);
      Node *node = root;
      for (int level = 1; level <= kDepth; level++) {
        unsigned id = node_id(c8, kDepth - level);
        if (node->child[id] == nullptr)
          node->child[id] = new_node(node);
        node = node->child[id];
      }
      if (node->unique == 0) {
        node->unique = 1;
        if (c >= 3) {
          node->color[0] = q[0]; node->color[1] = q[1];
          node->color[2] = q[2];
          node->color[3] = use_alpha ? q[3] : 0.0;
        } else {  // gray (+alpha): rgb mirror the gray lattice value
          node->color[0] = node->color[1] = node->color[2] = q[0];
          node->color[3] = use_alpha ? q[1] : 0.0;
        }
      }
    }
    define_colormap(root);
  }

  void define_colormap(Node *node) {
    int nch = use_alpha ? 16 : 8;
    for (int i = 0; i < nch; i++)
      if (node->child[i]) define_colormap(node->child[i]);
    if (node->unique) {
      node->color_number = (int)(colormap.size() / 4);
      for (int ch = 0; ch < 4; ch++) colormap.push_back(node->color[ch]);
    }
  }

  void closest_color(const Node *node) {
    int nch = use_alpha ? 16 : 8;
    for (int i = 0; i < nch; i++)
      if (node->child[i]) closest_color(node->child[i]);
    if (node->unique) {
      const double *p = &colormap[node->color_number * 4];
      // associate_alpha: color channels weighted by each side's alpha
      double aw = use_alpha ? p[3] / 65535.0 : 1.0;
      double bw = use_alpha ? target[3] / 65535.0 : 1.0;
      double d = aw * p[0] - bw * target[0];
      double distance = d * d;
      if (distance <= best_distance) {
        d = aw * p[1] - bw * target[1];
        distance += d * d;
        if (distance <= best_distance) {
          d = aw * p[2] - bw * target[2];
          distance += d * d;
          if (use_alpha) {
            double da = p[3] - target[3];
            distance += da * da;
          }
          if (distance <= best_distance) {
            best_distance = distance;
            best_number = node->color_number;
          }
        }
      }
    }
  }

  int assign(const double q[4]) {
    unsigned c8[4];
    channels8(q, c8);
    // CacheShift=2 on non-Apple builds: 6 bits/channel cells
    unsigned key = (c8[0] >> 2) | ((c8[1] >> 2) << 6) | ((c8[2] >> 2) << 12);
    if (use_alpha) key |= (c8[3] >> 2) << 18;
    if (cache[key] >= 0) return cache[key];
    Node *node = root;
    for (int index = kDepth - 1; index > 0; index--) {
      unsigned id = node_id(c8, index);
      if (node->child[id] == nullptr) break;
      node = node->child[id];
    }
    for (int ch = 0; ch < 4; ch++) target[ch] = q[ch];
    best_distance = 4.0 * 65536.0 * 65536.0 + 1.0;
    best_number = 0;
    closest_color(node->parent ? node->parent : node);
    cache[key] = best_number;
    return best_number;
  }
};

enum Dir { kNone, kWest, kEast, kNorth, kSouth };

void dither_step(Ctx &s, Dir dir) {
  if (s.x >= 0 && s.x < s.w && s.y >= 0 && s.y < s.h) {
    float *px = s.img + (s.y * s.w + s.x) * s.c;
    double pixel[4] = {0, 0, 0, 0};
    for (long ch = 0; ch < s.c; ch++) {
      double v = (double)px[ch] * 65535.0;   // quantum units throughout
      for (int i = 0; i < kQueue; i++)
        v += (1.0 / 16.0) * s.diffusion * s.weights[i] * s.err[i][ch];
      if (v < 0.0) v = 0.0;
      if (v > 65535.0) v = 65535.0;
      pixel[ch] = v;
    }
    int number = s.assign(pixel);
    const double *cm = &s.colormap[number * 4];
    std::memmove(s.err, s.err + 1, (kQueue - 1) * sizeof(s.err[0]));
    for (long ch = 0; ch < s.c; ch++) {
      // map channel order back: gray -> cm[0]; rgb(a) -> cm[ch], with
      // alpha stored at cm[3] when associated
      double chosen = cm[ch < 3 ? ch : 3];
      if (s.c < 3) chosen = cm[0];
      if (s.c == 2 && ch == 1) chosen = cm[3];  // gray+alpha
      px[ch] = (float)(chosen / 65535.0);
      s.err[kQueue - 1][ch] = pixel[ch] - chosen;
    }
    for (long ch = s.c; ch < 4; ch++) s.err[kQueue - 1][ch] = 0.0;
  }
  switch (dir) {
    case kWest: s.x--; break;
    case kEast: s.x++; break;
    case kNorth: s.y--; break;
    case kSouth: s.y++; break;
    default: break;
  }
}

void riemersma(Ctx &s, int level, Dir dir) {
  if (level == 1) {
    switch (dir) {
      case kWest:
        dither_step(s, kEast); dither_step(s, kSouth);
        dither_step(s, kWest); break;
      case kEast:
        dither_step(s, kWest); dither_step(s, kNorth);
        dither_step(s, kEast); break;
      case kNorth:
        dither_step(s, kSouth); dither_step(s, kEast);
        dither_step(s, kNorth); break;
      case kSouth:
        dither_step(s, kNorth); dither_step(s, kWest);
        dither_step(s, kSouth); break;
      default: break;
    }
    return;
  }
  switch (dir) {
    case kWest:
      riemersma(s, level - 1, kNorth); dither_step(s, kEast);
      riemersma(s, level - 1, kWest);  dither_step(s, kSouth);
      riemersma(s, level - 1, kWest);  dither_step(s, kWest);
      riemersma(s, level - 1, kSouth); break;
    case kEast:
      riemersma(s, level - 1, kSouth); dither_step(s, kWest);
      riemersma(s, level - 1, kEast);  dither_step(s, kNorth);
      riemersma(s, level - 1, kEast);  dither_step(s, kEast);
      riemersma(s, level - 1, kNorth); break;
    case kNorth:
      riemersma(s, level - 1, kWest);  dither_step(s, kSouth);
      riemersma(s, level - 1, kNorth); dither_step(s, kEast);
      riemersma(s, level - 1, kNorth); dither_step(s, kNorth);
      riemersma(s, level - 1, kEast);  break;
    case kSouth:
      riemersma(s, level - 1, kEast);  dither_step(s, kNorth);
      riemersma(s, level - 1, kSouth); dither_step(s, kWest);
      riemersma(s, level - 1, kSouth); dither_step(s, kSouth);
      riemersma(s, level - 1, kWest);  break;
    default: break;
  }
}

}  // namespace

extern "C" int rz_floyd_steinberg_posterize(float *img, long h, long w,
                                            long c, int levels,
                                            double diffusion) {
  // FloydSteinbergDither (quantize.c:300 region): serpentine scan; the
  // corrected pixel gains 7/16 of the previous pixel's error plus
  // 1/16 (ahead), 5/16 (below), 3/16 (behind) of the previous row's,
  // then goes through the same octree/cache color assignment.
  if (levels < 2 || c < 1 || c > 4) return 1;
  Ctx s;
  s.img = img; s.h = h; s.w = w; s.c = c;
  s.levels = levels; s.diffusion = diffusion;
  s.use_alpha = (c == 4 || c == 2);
  s.cache.assign(1u << 24, -1);
  s.classify();
  std::vector<double> errbuf(2 * w * 4, 0.0);
  for (long y = 0; y < h; y++) {
    double *current = &errbuf[(y & 1) * w * 4];
    double *previous = &errbuf[((y + 1) & 1) * w * 4];
    long v = (y & 1) ? -1 : 1;
    for (long x = 0; x < w; x++) {
      long u = (y & 1) ? (w - 1 - x) : x;
      float *px = img + (y * w + u) * c;
      double pixel[4] = {0, 0, 0, 0};
      for (long ch = 0; ch < c; ch++)
        pixel[ch] = (double)px[ch] * 65535.0;
      if (x > 0)
        for (long ch = 0; ch < c; ch++)
          pixel[ch] += 7.0 * diffusion * current[(u - v) * 4 + ch] / 16.0;
      if (y > 0) {
        if (x < w - 1)
          for (long ch = 0; ch < c; ch++)
            pixel[ch] += diffusion * previous[(u + v) * 4 + ch] / 16.0;
        for (long ch = 0; ch < c; ch++)
          pixel[ch] += 5.0 * diffusion * previous[u * 4 + ch] / 16.0;
        if (x > 0)
          for (long ch = 0; ch < c; ch++)
            pixel[ch] += 3.0 * diffusion * previous[(u - v) * 4 + ch] / 16.0;
      }
      for (long ch = 0; ch < c; ch++) {
        if (pixel[ch] < 0.0) pixel[ch] = 0.0;
        if (pixel[ch] > 65535.0) pixel[ch] = 65535.0;
      }
      int number = s.assign(pixel);
      const double *cm = &s.colormap[number * 4];
      for (long ch = 0; ch < c; ch++) {
        double chosen = cm[ch < 3 ? ch : 3];
        if (c < 3) chosen = cm[0];
        if (c == 2 && ch == 1) chosen = cm[3];
        px[ch] = (float)(chosen / 65535.0);
        current[u * 4 + ch] = pixel[ch] - chosen;
      }
      for (long ch = c; ch < 4; ch++) current[u * 4 + ch] = 0.0;
    }
  }
  return 0;
}

extern "C" int rz_riemersma_posterize(float *img, long h, long w, long c,
                                      int levels, double diffusion) {
  if (levels < 2 || c < 1 || c > 4) return 1;
  Ctx s;
  s.img = img; s.h = h; s.w = w; s.c = c;
  s.levels = levels; s.diffusion = diffusion;
  s.use_alpha = (c == 4 || c == 2);
  s.cache.assign(1u << 24, -1);
  std::memset(s.err, 0, sizeof(s.err));
  double weight = 1.0;
  for (int i = 0; i < kQueue; i++) {
    s.weights[i] = 1.0 / weight;
    weight *= std::exp(std::log(16.0) / (kQueue - 1.0));
  }
  s.classify();
  s.x = 0; s.y = 0;
  long extent = h > w ? h : w;
  int level = (int)std::log2((double)extent);
  if ((1L << level) < extent) level++;
  if (level > 0) riemersma(s, level, kNorth);
  dither_step(s, kNone);
  return 0;
}
