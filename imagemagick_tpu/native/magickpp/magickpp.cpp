// Magick++ compatibility layer — implementation.
//
// Embeds CPython and dispatches every Magick::Image method onto
// imagemagick_tpu.wand.api.MagickWand (the framework's MagickWand analog),
// so C++ callers run the same XLA-compiled device pipelines as Python.
// API shape mirrors /root/reference/Magick++/lib/Image.cpp; the dispatch
// bodies are original (thin PyObject_Call* plumbing, no MagickCore).
//
// Build (see native/__init__.py build_magickpp):
//   g++ -O2 -fPIC -shared magickpp.cpp $(python3-config --includes) \
//       -o libmagickpp_tpu.so $(python3-config --embed --ldflags)

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <cstdarg>
#include <cstdio>
#include <cstring>
#include <map>
#include <sstream>

#include "Magick++.h"

namespace Magick {

// ---------------------------------------------------------------------------
// Interpreter plumbing
// ---------------------------------------------------------------------------

static PyObject* g_api = 0;      // imagemagick_tpu.wand.api
static PyObject* g_support = 0;  // imagemagick_tpu.wand.cpp_support
static PyThreadState* g_saved = 0;
static bool g_weStartedPython = false;

struct Gil {
  PyGILState_STATE st;
  Gil() { st = PyGILState_Ensure(); }
  ~Gil() { PyGILState_Release(st); }
};

static std::string pyErrString() {
  if (!PyErr_Occurred()) return "unknown error";
  PyObject *type = 0, *value = 0, *tb = 0;
  PyErr_Fetch(&type, &value, &tb);
  PyErr_NormalizeException(&type, &value, &tb);
  std::string msg = "Magick++/tpu: ";
  if (value) {
    PyObject* s = PyObject_Str(value);
    if (s) {
      const char* c = PyUnicode_AsUTF8(s);
      if (c) msg += c;
      Py_DECREF(s);
    }
  }
  Py_XDECREF(type);
  Py_XDECREF(value);
  Py_XDECREF(tb);
  return msg;
}

static void throwPyErr() { throw Error(pyErrString()); }

void InitializeMagick(const char* /*path*/) {
  if (!Py_IsInitialized()) {
    Py_InitializeEx(0);
    g_weStartedPython = true;
  }
  if (g_api) return;  // already initialized
  {
    // Honor JAX_PLATFORMS=cpu before the backend initializes: this
    // machine's sitecustomize pins a TPU plugin that the env var alone
    // cannot override (must go through jax.config).
    PyRun_SimpleString(
        "import os\n"
        "if os.environ.get('JAX_PLATFORMS', '').strip() == 'cpu':\n"
        "    import jax\n"
        "    try:\n"
        "        jax.config.update('jax_platforms', 'cpu')\n"
        "    except Exception:\n"
        "        pass\n");
    g_api = PyImport_ImportModule("imagemagick_tpu.wand.api");
    if (!g_api) throwPyErr();
    g_support = PyImport_ImportModule("imagemagick_tpu.wand.cpp_support");
    if (!g_support) throwPyErr();
  }
  if (g_weStartedPython && !g_saved) g_saved = PyEval_SaveThread();
}

void TerminateMagick() {
  // Leave the interpreter up: jax/XLA teardown during Py_Finalize is not
  // worth the risk for short-lived tools; matches MagickCore's tolerance
  // for missing DestroyMagick calls.
}

// Build an args tuple from a Py_BuildValue format and call obj.name(*args).
// Returns a new reference; throws Magick::Error on Python exceptions.
static PyObject* vcall(PyObject* obj, const char* name, const char* fmt,
                       va_list ap) {
  PyObject* meth = PyObject_GetAttrString(obj, name);
  if (!meth) throwPyErr();
  PyObject* args;
  if (fmt && *fmt) {
    args = Py_VaBuildValue(fmt, ap);
    if (args && !PyTuple_Check(args)) {
      PyObject* t = PyTuple_Pack(1, args);
      Py_DECREF(args);
      args = t;
    }
  } else {
    args = PyTuple_New(0);
  }
  if (!args) {
    Py_DECREF(meth);
    throwPyErr();
  }
  PyObject* r = PyObject_CallObject(meth, args);
  Py_DECREF(meth);
  Py_DECREF(args);
  if (!r) throwPyErr();
  return r;
}

static void call0(PyObject* obj, const char* name, const char* fmt, ...) {
  Gil gil;
  va_list ap;
  va_start(ap, fmt);
  PyObject* r = vcall(obj, name, fmt, ap);
  va_end(ap);
  Py_DECREF(r);
}

static PyObject* callO(PyObject* obj, const char* name, const char* fmt,
                       ...) {
  va_list ap;
  va_start(ap, fmt);
  PyObject* r = vcall(obj, name, fmt, ap);
  va_end(ap);
  return r;  // caller holds GIL and owns the reference
}

static std::string callS(PyObject* obj, const char* name, const char* fmt,
                         ...) {
  Gil gil;
  va_list ap;
  va_start(ap, fmt);
  PyObject* r = vcall(obj, name, fmt, ap);
  va_end(ap);
  std::string out;
  if (r != Py_None) {
    PyObject* s = PyObject_Str(r);
    if (s) {
      const char* c = PyUnicode_AsUTF8(s);
      if (c) out = c;
      Py_DECREF(s);
    }
  }
  Py_DECREF(r);
  return out;
}

static long callL(PyObject* obj, const char* name, const char* fmt, ...) {
  Gil gil;
  va_list ap;
  va_start(ap, fmt);
  PyObject* r = vcall(obj, name, fmt, ap);
  va_end(ap);
  long v = PyLong_Check(r) ? PyLong_AsLong(r)
                           : (long)(PyFloat_Check(r) ? PyFloat_AsDouble(r)
                                                     : PyObject_IsTrue(r));
  Py_DECREF(r);
  return v;
}

static double callD(PyObject* obj, const char* name, const char* fmt, ...) {
  Gil gil;
  va_list ap;
  va_start(ap, fmt);
  PyObject* r = vcall(obj, name, fmt, ap);
  va_end(ap);
  double v = PyFloat_Check(r) ? PyFloat_AsDouble(r) : PyLong_AsDouble(r);
  Py_DECREF(r);
  return v;
}

// Unpack a python (a, b, c, d) long tuple.
static void call4L(PyObject* obj, const char* name, long out[4],
                   const char* fmt, ...) {
  Gil gil;
  va_list ap;
  va_start(ap, fmt);
  PyObject* r = vcall(obj, name, fmt, ap);
  va_end(ap);
  for (int i = 0; i < 4; i++) {
    PyObject* item = PySequence_GetItem(r, i);
    PyObject* num = item ? PyNumber_Long(item) : 0;
    out[i] = num ? PyLong_AsLong(num) : 0;
    Py_XDECREF(num);
    Py_XDECREF(item);
  }
  PyErr_Clear();
  Py_DECREF(r);
}

// ---------------------------------------------------------------------------
// Enum string tables (MagickCore option names, lowercase as the framework
// speaks them)
// ---------------------------------------------------------------------------

std::string toString(FilterType f) {
  static const char* names[] = {
      "undefined", "point", "box", "triangle", "hermite", "hann", "hamming",
      "blackman", "gaussian", "quadratic", "cubic", "catrom", "mitchell",
      "jinc", "sinc", "sincfast", "kaiser", "welch", "parzen", "bohman",
      "bartlett", "lagrange", "lanczos", "lanczossharp", "lanczos2",
      "lanczos2sharp", "robidoux", "robidouxsharp", "cosine", "spline"};
  return names[(int)f];
}

std::string toString(CompositeOperator op) {
  static const char* names[] = {
      "undefined", "alpha", "atop", "blend", "blur", "bumpmap", "changemask",
      "clear", "colorburn", "colordodge", "colorize", "copyblack", "copyblue",
      "copy", "copycyan", "copygreen", "copymagenta", "copyalpha", "copyred",
      "copyyellow", "darken", "darkenintensity", "difference", "displace",
      "dissolve", "distort", "dividedst", "dividesrc", "dstatop", "dst",
      "dstin", "dstout", "dstover", "exclusion", "hardlight", "hardmix",
      "hue", "in", "intensity", "lighten", "lightenintensity", "linearburn",
      "lineardodge", "linearlight", "luminize", "mathematics", "minusdst",
      "minussrc", "modulate", "modulusadd", "modulussubtract", "multiply",
      "none", "out", "over", "overlay", "pegtoplight", "pinlight", "plus",
      "replace", "saturate", "screen", "softlight", "srcatop", "src",
      "srcin", "srcout", "srcover", "threshold", "vividlight", "xor"};
  return names[(int)op];
}

std::string toString(ColorspaceType cs) {
  static const char* names[] = {
      "undefined", "cmy", "cmyk", "gray", "hcl", "hsb", "hsl", "hsv", "hwb",
      "lab", "lch", "lineargray", "log", "luv", "ohta", "rec601ycbcr",
      "rec709ycbcr", "rgb", "scrgb", "srgb", "transparent", "xyz", "ycbcr",
      "ycc", "yiq", "ypbpr", "yuv"};
  return names[(int)cs];
}

static ColorspaceType colorspaceFromString(const std::string& s) {
  for (int i = 0; i <= (int)YUVColorspace; i++)
    if (toString((ColorspaceType)i) == s) return (ColorspaceType)i;
  return UndefinedColorspace;
}

std::string toString(GravityType g) {
  static const char* names[] = {"undefined", "forget",    "northwest",
                                "north",     "northeast", "west",
                                "center",    "east",      "southwest",
                                "south",     "southeast"};
  return names[(int)g];
}

std::string toString(NoiseType n) {
  static const char* names[] = {"undefined", "uniform",
                                "gaussian",  "multiplicative",
                                "impulse",   "laplacian",
                                "poisson",   "random"};
  return names[(int)n];
}

std::string toString(MetricType m) {
  static const char* names[] = {"undefined", "ae",   "fuzz", "mae", "mepp",
                                "mse",       "ncc",  "pae",  "psnr", "phash",
                                "rmse",      "ssim", "dssim"};
  return names[(int)m];
}

std::string toString(DistortMethod d) {
  static const char* names[] = {
      "undefined", "affine", "affineprojection", "scalerotatetranslate",
      "perspective", "perspectiveprojection", "bilinearforward",
      "bilinearreverse", "polynomial", "arc", "polar", "depolar",
      "cylinder2plane", "plane2cylinder", "barrel", "barrelinverse",
      "shepards"};
  return names[(int)d];
}

std::string toString(MorphologyMethod m) {
  static const char* names[] = {
      "undefined", "convolve", "correlate", "erode", "dilate",
      "erodeintensity", "dilateintensity", "open", "close", "openintensity",
      "closeintensity", "smooth", "edgein", "edgeout", "edge", "tophat",
      "bottomhat", "hitandmiss", "thinning", "thicken", "distance",
      "iterativedistance"};
  return names[(int)m];
}

static std::string toString(AutoThresholdMethod m) {
  static const char* names[] = {"undefined", "kapur", "otsu", "triangle"};
  return names[(int)m];
}

static std::string toString(ImageType t) {
  static const char* names[] = {
      "undefined",       "bilevel",        "grayscale",
      "grayscalealpha",  "palette",        "palettealpha",
      "truecolor",       "truecoloralpha", "colorseparation",
      "colorseparationalpha", "optimize",  "palettebilevelalpha"};
  return names[(int)t];
}

static ImageType imageTypeFromString(const std::string& s) {
  for (int i = 0; i <= (int)PaletteBilevelAlphaType; i++)
    if (toString((ImageType)i) == s) return (ImageType)i;
  return UndefinedType;
}

static std::string toString(EvaluateOperator op) {
  static const char* names[] = {
      "undefined", "abs", "add", "addmodulus", "and", "cosine", "divide",
      "exponential", "gaussiannoise", "leftshift", "log", "max", "mean",
      "median", "min", "multiply", "or", "pow", "rightshift",
      "rootmeansquare", "set", "sine", "subtract", "threshold",
      "thresholdblack", "thresholdwhite", "uniformnoise", "xor"};
  return names[(int)op];
}

static std::string toString(StorageType s) {
  static const char* names[] = {"undefined", "char", "double",
                                "float",     "long", "short"};
  return names[(int)s];
}

static std::string toString(OrientationType o) {
  static const char* names[] = {"undefined",   "topleft",    "topright",
                                "bottomright", "bottomleft", "lefttop",
                                "righttop",    "rightbottom", "leftbottom"};
  return names[(int)o];
}

static OrientationType orientationFromString(const std::string& s) {
  for (int i = 0; i <= (int)LeftBottomOrientation; i++)
    if (toString((OrientationType)i) == s) return (OrientationType)i;
  return UndefinedOrientation;
}

static std::string toString(AlphaChannelOption a) {
  static const char* names[] = {
      "undefined", "activate", "associate", "background", "copy",
      "deactivate", "discrete", "disassociate", "extract", "off", "on",
      "opaque", "remove", "set", "shape", "transparent"};
  return names[(int)a];
}

// ---------------------------------------------------------------------------
// Geometry
// ---------------------------------------------------------------------------

Geometry::Geometry()
    : width_(0), height_(0), xOff_(0), yOff_(0), percent_(false),
      aspect_(false), greater_(false), less_(false), fillArea_(false),
      limitPixels_(false), isValid_(false) {}

Geometry::Geometry(size_t width, size_t height, magickpp_ssize_t xOff,
                   magickpp_ssize_t yOff)
    : width_(width), height_(height), xOff_(xOff), yOff_(yOff),
      percent_(false), aspect_(false), greater_(false), less_(false),
      fillArea_(false), limitPixels_(false), isValid_(true) {}

Geometry::Geometry(const std::string& geometry) { parse(geometry); }
Geometry::Geometry(const char* geometry) { parse(geometry ? geometry : ""); }

void Geometry::parse(const std::string& geometry) {
  // ParseGeometry grammar (MagickCore/geometry.c): flags may appear
  // anywhere; numbers are W[xH][{+-}X[{+-}Y]].
  width_ = height_ = 0;
  xOff_ = yOff_ = 0;
  percent_ = aspect_ = greater_ = less_ = fillArea_ = limitPixels_ = false;
  isValid_ = false;
  std::string s;
  for (size_t i = 0; i < geometry.size(); i++) {
    char c = geometry[i];
    if (c == '%') percent_ = true;
    else if (c == '!') aspect_ = true;
    else if (c == '>') greater_ = true;
    else if (c == '<') less_ = true;
    else if (c == '^') fillArea_ = true;
    else if (c == '@') limitPixels_ = true;
    else if (!isspace((unsigned char)c)) s += c;
  }
  const char* p = s.c_str();
  char* end = 0;
  if (*p && *p != '+' && *p != '-' && *p != 'x' && *p != 'X') {
    double w = strtod(p, &end);
    if (end != p) {
      width_ = (size_t)(w + 0.5);
      isValid_ = true;
      p = end;
    }
  }
  if (*p == 'x' || *p == 'X') {
    p++;
    double h = strtod(p, &end);
    if (end != p) {
      height_ = (size_t)(h + 0.5);
      isValid_ = true;
      p = end;
    }
  } else if (isValid_) {
    height_ = width_;  // "N" alone means NxN in resize contexts
  }
  if (*p == '+' || *p == '-') {
    long x = strtol(p, &end, 10);
    if (end != p) {
      xOff_ = x;
      isValid_ = true;
      p = end;
    }
  }
  if (*p == '+' || *p == '-') {
    long y = strtol(p, &end, 10);
    if (end != p) {
      yOff_ = y;
      isValid_ = true;
    }
  }
}

Geometry::operator std::string() const {
  std::ostringstream o;
  if (width_) o << width_;
  if (height_) o << "x" << height_;
  if (xOff_ || yOff_) {
    o << (xOff_ >= 0 ? "+" : "") << xOff_ << (yOff_ >= 0 ? "+" : "")
      << yOff_;
  }
  if (percent_) o << "%";
  if (fillArea_) o << "^";
  if (aspect_) o << "!";
  if (less_) o << "<";
  if (greater_) o << ">";
  if (limitPixels_) o << "@";
  return o.str();
}

// ---------------------------------------------------------------------------
// Color
// ---------------------------------------------------------------------------

Color::Color() : r_(0), g_(0), b_(0), a_(1), valid_(false) {}

Color::Color(double red, double green, double blue)
    : r_(red / QuantumRange), g_(green / QuantumRange),
      b_(blue / QuantumRange), a_(1.0), valid_(true) {}

Color::Color(double red, double green, double blue, double alpha)
    : r_(red / QuantumRange), g_(green / QuantumRange),
      b_(blue / QuantumRange), a_(alpha / QuantumRange), valid_(true) {}

static void resolveName(const std::string& name, double* r, double* g,
                        double* b, double* a) {
  if (!g_support)
    throw Error("Magick++/tpu: InitializeMagick() before using named colors");
  Gil gil;
  PyObject* t = callO(g_support, "parse_color_rgba", "(s)", name.c_str());
  *r = PyFloat_AsDouble(PyTuple_GetItem(t, 0));
  *g = PyFloat_AsDouble(PyTuple_GetItem(t, 1));
  *b = PyFloat_AsDouble(PyTuple_GetItem(t, 2));
  *a = PyFloat_AsDouble(PyTuple_GetItem(t, 3));
  Py_DECREF(t);
}

Color::Color(const std::string& name) : r_(0), g_(0), b_(0), a_(1) {
  resolveName(name, &r_, &g_, &b_, &a_);
  valid_ = true;
}

Color::Color(const char* name) : r_(0), g_(0), b_(0), a_(1) {
  resolveName(name ? name : "black", &r_, &g_, &b_, &a_);
  valid_ = true;
}

Color::operator std::string() const {
  char buf[80];
  snprintf(buf, sizeof(buf), "rgba(%d,%d,%d,%g)", (int)(r_ * 255.0 + 0.5),
           (int)(g_ * 255.0 + 0.5), (int)(b_ * 255.0 + 0.5), a_);
  return std::string(buf);
}

bool Color::operator==(const Color& other) const {
  const double eps = 0.5 / 255.0;
  return valid_ == other.valid_ && fabs(r_ - other.r_) < eps &&
         fabs(g_ - other.g_) < eps && fabs(b_ - other.b_) < eps &&
         fabs(a_ - other.a_) < eps;
}

// ---------------------------------------------------------------------------
// ImageRef
// ---------------------------------------------------------------------------

struct ImageRef {
  PyObject* wand;
  // settings mirrored C++-side (Magick++ Options role)
  size_t quality;
  size_t quantizeColors;
  bool quantizeDither;
  FilterType filter;
  GravityType gravity;
  Color background, border, matte;
  std::string font;
  double pointsize;
  std::string filename;
  // pixel staging for getPixels/syncPixels
  std::vector<float> pixbuf;
  long px, py;
  size_t pw, ph;
  // last compare() stats
  double mepp, nme, nmx;
  // widened Options state (string/number/color settings + draw state)
  std::map<std::string, std::string> sset;
  std::map<std::string, double> dset;
  std::map<std::string, Color> cset;
  std::vector<double> dashes;
  PyObject* fillPattern;    // cloned wands (owned); 0 = unset
  PyObject* strokePattern;
  PyObject* readMaskWand;
  PyObject* writeMaskWand;

  double getd(const char* k, double dflt) const {
    std::map<std::string, double>::const_iterator it = dset.find(k);
    return it == dset.end() ? dflt : it->second;
  }
  std::string gets(const char* k, const char* dflt) const {
    std::map<std::string, std::string>::const_iterator it = sset.find(k);
    return it == sset.end() ? std::string(dflt) : it->second;
  }
  Color getc(const char* k, const Color& dflt) const {
    std::map<std::string, Color>::const_iterator it = cset.find(k);
    return it == cset.end() ? dflt : it->second;
  }

  ImageRef()
      : wand(0), quality(92), quantizeColors(256), quantizeDither(false),
        filter(LanczosFilter), gravity(UndefinedGravity),
        background(QuantumRange, QuantumRange, QuantumRange),
        border(223.0 / 255.0 * QuantumRange, 223.0 / 255.0 * QuantumRange,
               223.0 / 255.0 * QuantumRange),
        matte(), font(), pointsize(12.0), px(0), py(0), pw(0), ph(0),
        mepp(0), nme(0), nmx(0), fillPattern(0), strokePattern(0),
        readMaskWand(0), writeMaskWand(0) {}
};

static PyObject* newWand() {
  if (!g_api)
    throw Error("Magick++/tpu: call InitializeMagick() first");
  Gil gil;
  PyObject* cls = PyObject_GetAttrString(g_api, "MagickWand");
  if (!cls) throwPyErr();
  PyObject* w = PyObject_CallObject(cls, 0);
  Py_DECREF(cls);
  if (!w) throwPyErr();
  return w;
}

#define W (ref_->wand)

// ---------------------------------------------------------------------------
// Image — lifecycle
// ---------------------------------------------------------------------------

Image::Image() : ref_(new ImageRef) { ref_->wand = newWand(); }

Image::Image(const std::string& imageSpec) : ref_(new ImageRef) {
  ref_->wand = newWand();
  read(imageSpec);
}

Image::Image(const Geometry& size, const Color& color) : ref_(new ImageRef) {
  ref_->wand = newWand();
  call0(W, "new_image", "(iis)", (int)size.width(), (int)size.height(),
        std::string(color).c_str());
}

Image::Image(const Blob& blob) : ref_(new ImageRef) {
  ref_->wand = newWand();
  read(blob);
}

Image::Image(const Image& other) : ref_(new ImageRef) {
  *ref_ = *other.ref_;
  ref_->wand = 0;
  Gil gil;
  Py_XINCREF(ref_->fillPattern);
  Py_XINCREF(ref_->strokePattern);
  Py_XINCREF(ref_->readMaskWand);
  Py_XINCREF(ref_->writeMaskWand);
  ref_->wand = callO(other.ref_->wand, "clone", "()");
}

Image& Image::operator=(const Image& other) {
  if (this == &other) return *this;
  PyObject* old = ref_->wand;
  {
    Gil gil;
    PyObject* w = callO(other.ref_->wand, "clone", "()");
    Py_XDECREF(ref_->fillPattern);
    Py_XDECREF(ref_->strokePattern);
    Py_XDECREF(ref_->readMaskWand);
    Py_XDECREF(ref_->writeMaskWand);
    *ref_ = *other.ref_;
    Py_XINCREF(ref_->fillPattern);
    Py_XINCREF(ref_->strokePattern);
    Py_XINCREF(ref_->readMaskWand);
    Py_XINCREF(ref_->writeMaskWand);
    ref_->wand = w;
    Py_XDECREF(old);
  }
  return *this;
}

Image::~Image() {
  if (Py_IsInitialized()) {
    Gil gil;
    Py_XDECREF(ref_->wand);
    Py_XDECREF(ref_->fillPattern);
    Py_XDECREF(ref_->strokePattern);
    Py_XDECREF(ref_->readMaskWand);
    Py_XDECREF(ref_->writeMaskWand);
  }
  delete ref_;
}

bool Image::isValid() const { return callL(W, "__len__", "()") > 0; }

// ---------------------------------------------------------------------------
// I/O
// ---------------------------------------------------------------------------

void Image::read(const std::string& imageSpec) {
  call0(W, "clear", "()");
  call0(W, "read_image", "(s)", imageSpec.c_str());
  ref_->filename = imageSpec;
}

void Image::read(const Blob& blob) {
  call0(W, "clear", "()");
  call0(W, "read_image_blob", "(y#)", (const char*)blob.data(),
        (Py_ssize_t)blob.length());
}

void Image::read(const Geometry& size, const std::string& imageSpec) {
  call0(g_support, "set_setting", "(Oss)", W, "size",
        std::string(size).c_str());
  read(imageSpec);
}

void Image::ping(const std::string& imageSpec) {
  call0(W, "clear", "()");
  call0(g_support, "ping", "(Os)", W, imageSpec.c_str());
  ref_->filename = imageSpec;
}

void Image::write(const std::string& imageSpec) {
  call0(W, "write_images", "(s)", imageSpec.c_str());
}

void Image::write(Blob* blob) { write(blob, magick()); }

void Image::write(Blob* blob, const std::string& fmt) {
  Gil gil;
  PyObject* r = callO(W, "get_image_blob", "(s)",
                      fmt.empty() ? "png" : fmt.c_str());
  char* buf = 0;
  Py_ssize_t len = 0;
  if (PyBytes_AsStringAndSize(r, &buf, &len) < 0) {
    Py_DECREF(r);
    throwPyErr();
  }
  blob->update(buf, (size_t)len);
  Py_DECREF(r);
}

// ---------------------------------------------------------------------------
// Attributes
// ---------------------------------------------------------------------------

size_t Image::columns() const { return callL(W, "get_image_width", "()"); }
size_t Image::rows() const { return callL(W, "get_image_height", "()"); }

Geometry Image::size() const { return Geometry(columns(), rows()); }
void Image::size(const Geometry& g) { extent(g); }

size_t Image::depth() const { return callL(W, "get_image_depth", "()"); }
void Image::depth(size_t d) { call0(W, "set_image_depth", "(i)", (int)d); }

std::string Image::magick() const {
  std::string m = callS(W, "get_image_format", "()");
  return m.empty() ? "png" : m;
}
void Image::magick(const std::string& m) {
  call0(W, "set_image_format", "(s)", m.c_str());
}

std::string Image::fileName() const { return ref_->filename; }
void Image::fileName(const std::string& name) {
  ref_->filename = name;
  call0(W, "set_image_filename", "(s)", name.c_str());
}

size_t Image::quality() const { return ref_->quality; }
void Image::quality(size_t q) {
  ref_->quality = q;
  Gil gil;
  PyObject* v = PyLong_FromSize_t(q);
  PyObject_SetAttrString(W, "quality", v);
  Py_DECREF(v);
}

ColorspaceType Image::colorSpace() const {
  return colorspaceFromString(callS(W, "get_image_colorspace", "()"));
}
std::string Image::colorSpaceName() const {
  return callS(W, "get_image_colorspace", "()");
}
void Image::colorSpace(ColorspaceType cs) {
  call0(W, "transform_image_colorspace", "(s)", toString(cs).c_str());
}
void Image::transformColorSpace(ColorspaceType cs) { colorSpace(cs); }

ImageType Image::type() const {
  return imageTypeFromString(callS(W, "get_image_type", "()"));
}
void Image::type(ImageType t) {
  call0(W, "set_image_type", "(s)", toString(t).c_str());
}

bool Image::alpha() const {
  return callL(W, "get_image_alpha_channel", "()") != 0;
}
void Image::alpha(bool enable) {
  call0(W, "set_image_alpha_channel", "(s)", enable ? "on" : "off");
}
void Image::alphaChannel(AlphaChannelOption option) {
  call0(W, "set_image_alpha_channel", "(s)", toString(option).c_str());
}

double Image::colorFuzz() const { return callD(W, "get_image_fuzz", "()"); }
void Image::colorFuzz(double fuzz) {
  call0(W, "set_image_fuzz", "(d)", fuzz / QuantumRange);
}

Color Image::backgroundColor() const { return ref_->background; }
void Image::backgroundColor(const Color& c) {
  ref_->background = c;
  call0(W, "set_background_color", "(s)", std::string(c).c_str());
}
Color Image::borderColor() const { return ref_->border; }
void Image::borderColor(const Color& c) {
  ref_->border = c;
  call0(W, "set_image_border_color", "(s)", std::string(c).c_str());
}
Color Image::matteColor() const { return ref_->matte; }
void Image::matteColor(const Color& c) {
  ref_->matte = c;
  call0(W, "set_image_matte_color", "(s)", std::string(c).c_str());
}

std::string Image::font() const { return ref_->font; }
void Image::font(const std::string& f) {
  ref_->font = f;
  Gil gil;
  PyObject* v = PyUnicode_FromString(f.c_str());
  PyObject_SetAttrString(W, "font", v);
  Py_DECREF(v);
}
double Image::fontPointsize() const { return ref_->pointsize; }
void Image::fontPointsize(double p) {
  ref_->pointsize = p;
  Gil gil;
  PyObject* v = PyFloat_FromDouble(p);
  PyObject_SetAttrString(W, "pointsize", v);
  Py_DECREF(v);
}

FilterType Image::filterType() const { return ref_->filter; }
void Image::filterType(FilterType f) { ref_->filter = f; }

GravityType Image::gravity() const { return ref_->gravity; }
void Image::gravity(GravityType g) {
  ref_->gravity = g;
  call0(W, "set_image_gravity", "(s)", toString(g).c_str());
}

std::string Image::label() const {
  return callS(W, "get_image_property", "(s)", "label");
}
void Image::label(const std::string& l) {
  call0(W, "set_image_property", "(ss)", "label", l.c_str());
}
std::string Image::comment() const {
  return callS(W, "get_image_property", "(s)", "comment");
}
void Image::comment(const std::string& c) {
  call0(W, "set_image_property", "(ss)", "comment", c.c_str());
}

OrientationType Image::orientation() const {
  return orientationFromString(callS(W, "get_image_orientation", "()"));
}
void Image::orientation(OrientationType o) {
  call0(W, "set_image_orientation", "(s)", toString(o).c_str());
}

Geometry Image::page() const {
  long v[4];
  call4L(W, "get_image_page", v, "()");
  return Geometry((size_t)v[0], (size_t)v[1], v[2], v[3]);
}
void Image::page(const Geometry& g) {
  call0(W, "set_image_page", "(iiii)", (int)g.width(), (int)g.height(),
        (int)g.xOff(), (int)g.yOff());
}

size_t Image::animationDelay() const {
  return callL(W, "get_image_delay", "()");
}
void Image::animationDelay(size_t d) {
  call0(W, "set_image_delay", "(i)", (int)d);
}

double Image::gamma() const { return callD(W, "get_image_gamma", "()"); }
size_t Image::totalColors() const {
  return callL(W, "get_image_colors", "()");
}
std::string Image::signature() const {
  return callS(W, "get_image_signature", "()");
}

std::string Image::attribute(const std::string& name) const {
  return callS(W, "get_image_property", "(s)", name.c_str());
}
void Image::attribute(const std::string& name, const std::string& value) {
  call0(W, "set_image_property", "(ss)", name.c_str(), value.c_str());
}
std::string Image::artifact(const std::string& name) const {
  return attribute(name);
}
void Image::artifact(const std::string& name, const std::string& value) {
  attribute(name, value);
}
void Image::defineValue(const std::string& magick, const std::string& key,
                        const std::string& value) {
  attribute(magick + ":" + key, value);
}
std::string Image::defineValue(const std::string& magick,
                               const std::string& key) const {
  return attribute(magick + ":" + key);
}

Geometry Image::boundingBox() const {
  long v[4];
  call4L(g_support, "bounding_box", v, "(O)", W);
  return Geometry((size_t)v[0], (size_t)v[1], v[2], v[3]);
}

size_t Image::fileSize() const { return callL(W, "get_image_length", "()"); }
std::string Image::format() const { return magick(); }

double Image::xResolution() const {
  Gil gil;
  PyObject* r = callO(W, "get_image_resolution", "()");
  double v = PyFloat_AsDouble(PyTuple_GetItem(r, 0));
  Py_DECREF(r);
  return v;
}
double Image::yResolution() const {
  Gil gil;
  PyObject* r = callO(W, "get_image_resolution", "()");
  double v = PyFloat_AsDouble(PyTuple_GetItem(r, 1));
  Py_DECREF(r);
  return v;
}
void Image::resolutionUnits(const std::string& units) {
  call0(W, "set_image_units", "(s)", units.c_str());
}
void Image::density(const Geometry& g) {
  call0(W, "set_image_resolution", "(dd)", (double)g.width(),
        (double)(g.height() ? g.height() : g.width()));
}

// ---------------------------------------------------------------------------
// Profiles
// ---------------------------------------------------------------------------

void Image::profile(const std::string& name, const Blob& profileBlob) {
  call0(W, "set_image_profile", "(sy#)", name.c_str(),
        (const char*)profileBlob.data(), (Py_ssize_t)profileBlob.length());
}

Blob Image::profile(const std::string& name) const {
  Gil gil;
  PyObject* r = callO(W, "get_image_profile", "(s)", name.c_str());
  Blob out;
  if (r != Py_None && PyBytes_Check(r)) {
    char* buf;
    Py_ssize_t len;
    PyBytes_AsStringAndSize(r, &buf, &len);
    out.update(buf, (size_t)len);
  }
  Py_DECREF(r);
  return out;
}

Blob Image::exifProfile() const { return profile("exif"); }
Blob Image::iccColorProfile() const { return profile("icc"); }
void Image::strip() { call0(W, "strip_image", "()"); }

// ---------------------------------------------------------------------------
// Geometry ops
// ---------------------------------------------------------------------------

static void metaDims(ImageRef* ref_, const Geometry& g, long* w, long* h) {
  long v[4];
  call4L(g_support, "resolve_meta_geometry", v, "(Os)", ref_->wand,
         std::string(g).c_str());
  *w = v[0];
  *h = v[1];
}

void Image::resize(const Geometry& g) { resize(g, ref_->filter); }
void Image::resize(const Geometry& g, FilterType filter) {
  long w, h;
  metaDims(ref_, g, &w, &h);
  call0(W, "resize_image", "(iis)", (int)w, (int)h,
        toString(filter).c_str());
}
void Image::adaptiveResize(const Geometry& g) {
  long w, h;
  metaDims(ref_, g, &w, &h);
  call0(W, "adaptive_resize_image", "(ii)", (int)w, (int)h);
}
void Image::scale(const Geometry& g) {
  long w, h;
  metaDims(ref_, g, &w, &h);
  call0(W, "scale_image", "(ii)", (int)w, (int)h);
}
void Image::sample(const Geometry& g) {
  long w, h;
  metaDims(ref_, g, &w, &h);
  call0(W, "sample_image", "(ii)", (int)w, (int)h);
}
void Image::thumbnail(const Geometry& g) {
  long w, h;
  metaDims(ref_, g, &w, &h);
  call0(W, "thumbnail_image", "(ii)", (int)w, (int)h);
}
void Image::zoom(const Geometry& g) { resize(g); }
void Image::magnify() { call0(W, "magnify_image", "()"); }
void Image::minify() { call0(W, "minify_image", "()"); }
void Image::liquidRescale(const Geometry& g) {
  long w, h;
  metaDims(ref_, g, &w, &h);
  call0(W, "liquid_rescale_image", "(ii)", (int)w, (int)h);
}

void Image::crop(const Geometry& g) {
  call0(W, "crop_image_geometry", "(s)", std::string(g).c_str());
}
void Image::chop(const Geometry& g) {
  call0(W, "chop_image", "(iiii)", (int)g.width(), (int)g.height(),
        (int)g.xOff(), (int)g.yOff());
}
void Image::extent(const Geometry& g) {
  call0(W, "extent_image", "(iiii)", (int)g.width(), (int)g.height(),
        (int)-g.xOff(), (int)-g.yOff());
}
void Image::extent(const Geometry& g, const Color& background) {
  call0(g_support, "extent_gravity", "(Oiiss)", W, (int)g.width(),
        (int)g.height(), toString(ref_->gravity).c_str(),
        std::string(background).c_str());
}
void Image::extent(const Geometry& g, GravityType gravity) {
  call0(g_support, "extent_gravity", "(OiisO)", W, (int)g.width(),
        (int)g.height(), toString(gravity).c_str(), Py_None);
}
void Image::shave(const Geometry& g) {
  call0(W, "shave_image", "(ii)", (int)g.width(), (int)g.height());
}
void Image::splice(const Geometry& g) {
  call0(W, "splice_image", "(iiii)", (int)g.width(), (int)g.height(),
        (int)g.xOff(), (int)g.yOff());
}
void Image::roll(const Geometry& g) {
  call0(W, "roll_image", "(ii)", (int)g.xOff(), (int)g.yOff());
}
void Image::roll(size_t columns_, size_t rows_) {
  call0(W, "roll_image", "(ii)", (int)columns_, (int)rows_);
}
void Image::trim() { call0(W, "trim_image", "(d)", 0.0); }
void Image::border(const Geometry& g) {
  call0(W, "border_image", "(sii)", std::string(ref_->border).c_str(),
        (int)g.width(), (int)g.height());
}
void Image::frame(const Geometry& g) {
  call0(W, "frame_image", "(sii)", std::string(ref_->matte).c_str(),
        (int)g.width(), (int)g.height());
}
void Image::flip() { call0(W, "flip_image", "()"); }
void Image::flop() { call0(W, "flop_image", "()"); }
void Image::transpose() { call0(W, "transpose_image", "()"); }
void Image::transverse() { call0(W, "transverse_image", "()"); }
void Image::rotate(double degrees) {
  call0(W, "rotate_image", "(sd)", std::string(ref_->background).c_str(),
        degrees);
}
void Image::shear(double xShear, double yShear) {
  call0(W, "shear_image", "(sdd)", std::string(ref_->background).c_str(),
        xShear, yShear);
}
void Image::deskew(double threshold) {
  call0(W, "deskew_image", "(d)", threshold / QuantumRange);
}
void Image::autoOrient() { call0(W, "auto_orient_image", "()"); }
void Image::repage() { call0(W, "reset_image_page", "(s)", ""); }

// ---------------------------------------------------------------------------
// Filters / effects
// ---------------------------------------------------------------------------

void Image::blur(double radius, double sigma) {
  call0(W, "blur_image", "(dd)", radius, sigma);
}
void Image::gaussianBlur(double radius, double sigma) {
  call0(W, "gaussian_blur_image", "(dd)", radius, sigma);
}
void Image::adaptiveBlur(double radius, double sigma) {
  call0(W, "adaptive_blur_image", "(dd)", radius, sigma);
}
void Image::motionBlur(double radius, double sigma, double angle) {
  call0(W, "motion_blur_image", "(ddd)", radius, sigma, angle);
}
void Image::rotationalBlur(double angle) {
  call0(W, "rotational_blur_image", "(d)", angle);
}
void Image::selectiveBlur(double radius, double sigma, double threshold) {
  call0(W, "selective_blur_image", "(ddd)", radius, sigma,
        threshold / QuantumRange);
}
void Image::sharpen(double radius, double sigma) {
  call0(W, "sharpen_image", "(dd)", radius, sigma);
}
void Image::adaptiveSharpen(double radius, double sigma) {
  call0(W, "adaptive_sharpen_image", "(dd)", radius, sigma);
}
void Image::unsharpmask(double radius, double sigma, double amount,
                        double threshold) {
  call0(W, "unsharp_mask_image", "(dddd)", radius, sigma, amount,
        threshold);
}
void Image::despeckle() { call0(W, "despeckle_image", "()"); }
void Image::reduceNoise() { call0(W, "statistic_image", "(sii)", "nonpeak", 3, 3); }
void Image::reduceNoise(size_t order) {
  call0(W, "statistic_image", "(sii)", "nonpeak", (int)order, (int)order);
}
void Image::medianFilter(double radius) {
  int n = radius > 0 ? (int)(2 * radius + 1) : 3;
  call0(W, "statistic_image", "(sii)", "median", n, n);
}
void Image::edge(double radius) { call0(W, "edge_image", "(d)", radius); }
void Image::emboss(double radius, double sigma) {
  call0(W, "emboss_image", "(dd)", radius, sigma);
}
void Image::shade(double azimuth, double elevation, bool colorShading) {
  call0(W, "shade_image", "(idd)", colorShading ? 0 : 1, azimuth,
        elevation);
}
void Image::spread(double amount) {
  call0(W, "spread_image", "(d)", amount);
}
void Image::charcoal(double radius, double sigma) {
  call0(W, "charcoal_image", "(dd)", radius, sigma);
}
void Image::oilPaint(double radius) {
  call0(W, "oil_paint_image", "(d)", radius);
}
void Image::sketch(double radius, double sigma, double angle) {
  call0(W, "sketch_image", "(ddd)", radius, sigma, angle);
}
void Image::vignette(double radius, double sigma, magickpp_ssize_t x,
                     magickpp_ssize_t y) {
  call0(W, "vignette_image", "(ddii)", radius, sigma, (int)x, (int)y);
}
void Image::wave(double amplitude, double wavelength) {
  call0(W, "wave_image", "(dd)", amplitude, wavelength);
}
void Image::swirl(double degrees) {
  call0(W, "swirl_image", "(d)", degrees);
}
void Image::implode(double factor) {
  call0(W, "implode_image", "(d)", factor);
}
void Image::solarize(double factor) {
  call0(W, "solarize_image", "(d)", factor / QuantumRange);
}
void Image::sepiaTone(double threshold) {
  call0(W, "sepia_tone_image", "(d)", threshold / QuantumRange);
}
void Image::blueShift(double factor) {
  call0(W, "blue_shift_image", "(d)", factor);
}
void Image::addNoise(NoiseType noiseType, double attenuate) {
  call0(W, "add_noise_image", "(sd)", toString(noiseType).c_str(),
        attenuate);
}
void Image::colorize(unsigned int alpha, const Color& penColor) {
  call0(W, "colorize_image", "(sd)", std::string(penColor).c_str(),
        alpha / 100.0);
}
void Image::tint(const std::string& opacity, const Color& penColor) {
  double a = atof(opacity.c_str()) / 100.0;
  call0(W, "tint_image", "(sd)", std::string(penColor).c_str(), a);
}
void Image::shadow(double alpha, double sigma, magickpp_ssize_t x,
                   magickpp_ssize_t y) {
  call0(W, "shadow_image", "(ddii)", alpha, sigma, (int)x, (int)y);
}
void Image::polaroid(const std::string& caption, double angle) {
  call0(W, "polaroid_image", "(Osd)", Py_None, caption.c_str(), angle);
}
void Image::waveletDenoise(double threshold, double softness) {
  call0(W, "wavelet_denoise_image", "(dd)", threshold / QuantumRange,
        softness);
}
void Image::kuwahara(double radius, double sigma) {
  call0(W, "kuwahara_image", "(dd)", radius, sigma <= 0 ? radius : sigma);
}
void Image::localContrast(double radius, double strength) {
  call0(W, "local_contrast_image", "(dd)", radius, strength);
}
void Image::convolve(size_t order, const double* kernel) {
  std::ostringstream csv;
  for (size_t i = 0; i < order * order; i++)
    csv << (i ? "," : "") << kernel[i];
  call0(g_support, "convolve", "(Ois)", W, (int)order, csv.str().c_str());
}
static std::string toString(ChannelType c) {
  static const char* names[] = {"all",  "red",     "green",  "blue",
                                "alpha", "gray",    "cyan",   "magenta",
                                "yellow", "black",  "all"};
  return names[(int)c];
}

// channel-scoped dispatch: run the op, keep only the named channel
#define CHANNEL_OP(ch, method, fmt, ...)                              \
  call0(g_support, "apply_channel", "(Oss" fmt ")", W,                \
        toString(ch).c_str(), method, ##__VA_ARGS__)

void Image::blurChannel(ChannelType ch, double radius, double sigma) {
  CHANNEL_OP(ch, "blur_image", "dd", radius, sigma);
}
void Image::gaussianBlurChannel(ChannelType ch, double radius,
                                double sigma) {
  CHANNEL_OP(ch, "gaussian_blur_image", "dd", radius, sigma);
}
void Image::sharpenChannel(ChannelType ch, double radius, double sigma) {
  CHANNEL_OP(ch, "sharpen_image", "dd", radius, sigma);
}
void Image::adaptiveSharpenChannel(ChannelType ch, double radius,
                                   double sigma) {
  CHANNEL_OP(ch, "adaptive_sharpen_image", "dd", radius, sigma);
}
void Image::negateChannel(ChannelType ch, bool grayscale) {
  CHANNEL_OP(ch, "negate_image", "i", grayscale ? 1 : 0);
}
void Image::gammaChannel(ChannelType ch, double g) {
  CHANNEL_OP(ch, "gamma_image", "d", g);
}
void Image::levelChannel(ChannelType ch, double blackPoint,
                         double whitePoint, double gamma_) {
  CHANNEL_OP(ch, "level_image", "ddd", blackPoint / QuantumRange, gamma_,
             whitePoint / QuantumRange);
}
void Image::autoLevelChannel(ChannelType ch) {
  CHANNEL_OP(ch, "auto_level_image", "");
}
void Image::autoGammaChannel(ChannelType ch) {
  CHANNEL_OP(ch, "auto_gamma_image", "");
}
void Image::brightnessContrastChannel(ChannelType ch, double brightness,
                                      double contrast) {
  CHANNEL_OP(ch, "brightness_contrast_image", "dd", brightness, contrast);
}
void Image::contrastStretchChannel(ChannelType ch, double blackPoint,
                                   double whitePoint) {
  CHANNEL_OP(ch, "contrast_stretch_image", "dd", blackPoint, whitePoint);
}
void Image::sigmoidalContrastChannel(ChannelType ch, bool sharpen,
                                     double contrast, double midpoint) {
  CHANNEL_OP(ch, "sigmoidal_contrast_image", "idd", sharpen ? 1 : 0,
             contrast, midpoint / QuantumRange);
}
void Image::addNoiseChannel(ChannelType ch, NoiseType noiseType) {
  CHANNEL_OP(ch, "add_noise_image", "sd", toString(noiseType).c_str(), 1.0);
}
void Image::clampChannel(ChannelType ch) {
  CHANNEL_OP(ch, "clamp_image", "");
}
void Image::randomThresholdChannel(ChannelType ch, double low, double high) {
  CHANNEL_OP(ch, "random_threshold_image", "dd", low / QuantumRange,
             high / QuantumRange);
}
void Image::equalizeChannel(ChannelType ch) {
  CHANNEL_OP(ch, "equalize_image", "");
}

void Image::morphology(MorphologyMethod method, const std::string& kernel,
                       magickpp_ssize_t iterations) {
  call0(W, "morphology_image", "(sis)", toString(method).c_str(),
        (int)iterations, kernel.c_str());
}
void Image::statistic(const std::string& type, size_t width, size_t height) {
  call0(W, "statistic_image", "(sii)", type.c_str(), (int)width,
        (int)height);
}

// ---------------------------------------------------------------------------
// Enhancement
// ---------------------------------------------------------------------------

void Image::normalize() { call0(W, "normalize_image", "()"); }
void Image::equalize() { call0(W, "equalize_image", "()"); }
void Image::autoLevel() { call0(W, "auto_level_image", "()"); }
void Image::autoGamma() { call0(W, "auto_gamma_image", "()"); }
void Image::gamma(double g) { call0(W, "gamma_image", "(d)", g); }
void Image::gamma(double r, double g, double b) {
  call0(g_support, "gamma_rgb", "(Oddd)", W, r, g, b);
}
void Image::level(double blackPoint, double whitePoint, double gamma_) {
  call0(W, "level_image", "(ddd)", blackPoint / QuantumRange, gamma_,
        whitePoint / QuantumRange);
}
void Image::levelize(double blackPoint, double whitePoint, double gamma_) {
  call0(W, "levelize_image", "(ddd)", blackPoint / QuantumRange, gamma_,
        whitePoint / QuantumRange);
}
void Image::negate(bool grayscale) {
  call0(W, "negate_image", "(i)", grayscale ? 1 : 0);
}
void Image::modulate(double brightness, double saturation, double hue) {
  call0(W, "modulate_image", "(ddd)", brightness, saturation, hue);
}
void Image::brightnessContrast(double brightness, double contrast) {
  call0(W, "brightness_contrast_image", "(dd)", brightness, contrast);
}
void Image::contrast(bool sharpen) {
  call0(W, "contrast_image", "(i)", sharpen ? 1 : 0);
}
void Image::contrastStretch(double blackPoint, double whitePoint) {
  call0(W, "contrast_stretch_image", "(dd)", blackPoint, whitePoint);
}
void Image::linearStretch(double blackPoint, double whitePoint) {
  call0(W, "linear_stretch_image", "(dd)", blackPoint, whitePoint);
}
void Image::sigmoidalContrast(bool sharpen, double contrast,
                              double midpoint) {
  call0(W, "sigmoidal_contrast_image", "(idd)", sharpen ? 1 : 0, contrast,
        midpoint / QuantumRange);
}
void Image::clahe(size_t width, size_t height, size_t bins,
                  double clipLimit) {
  call0(W, "clahe_image", "(iiid)", (int)width, (int)height, (int)bins,
        clipLimit);
}
void Image::enhance() { call0(W, "enhance_image", "()"); }
void Image::whiteBalance() { call0(W, "white_balance_image", "()"); }
void Image::cdl(const std::string& cdl_) {
  call0(W, "color_decision_list_image", "(s)", cdl_.c_str());
}

// ---------------------------------------------------------------------------
// Thresholds / quantization
// ---------------------------------------------------------------------------

void Image::threshold(double t) {
  call0(W, "threshold_image", "(d)", t / QuantumRange);
}
void Image::blackThreshold(const std::string& t) {
  call0(W, "black_threshold_image", "(s)", t.c_str());
}
void Image::whiteThreshold(const std::string& t) {
  call0(W, "white_threshold_image", "(s)", t.c_str());
}
void Image::adaptiveThreshold(size_t width, size_t height, double bias) {
  call0(W, "adaptive_threshold_image", "(iid)", (int)width, (int)height,
        bias / QuantumRange);
}
void Image::autoThreshold(AutoThresholdMethod method) {
  call0(W, "auto_threshold_image", "(s)", toString(method).c_str());
}
void Image::randomThreshold(double low, double high) {
  call0(W, "random_threshold_image", "(dd)", low / QuantumRange,
        high / QuantumRange);
}
void Image::orderedDither(const std::string& thresholdMap) {
  call0(W, "ordered_dither_image", "(s)", thresholdMap.c_str());
}
void Image::posterize(size_t levels, bool dither) {
  call0(W, "posterize_image", "(ii)", (int)levels, dither ? 1 : 0);
}
void Image::quantize(bool /*measureError*/) {
  call0(W, "quantize_image", "(i)", (int)ref_->quantizeColors);
}
size_t Image::quantizeColors() const { return ref_->quantizeColors; }
void Image::quantizeColors(size_t n) { ref_->quantizeColors = n; }
bool Image::quantizeDither() const { return ref_->quantizeDither; }
void Image::quantizeDither(bool d) { ref_->quantizeDither = d; }
void Image::segment(double clusterThreshold, double smoothingThreshold) {
  call0(W, "segment_image", "(sidd)", "srgb", 0, clusterThreshold,
        smoothingThreshold);
}
void Image::clamp() { call0(W, "clamp_image", "()"); }

// ---------------------------------------------------------------------------
// Color ops
// ---------------------------------------------------------------------------

void Image::opaque(const Color& target, const Color& fill) {
  call0(W, "opaque_paint_image", "(ssd)", std::string(target).c_str(),
        std::string(fill).c_str(), colorFuzz());
}
void Image::transparent(const Color& target, double alpha_) {
  call0(W, "transparent_paint_image", "(sdd)", std::string(target).c_str(),
        alpha_, colorFuzz());
}
void Image::floodFillColor(const Geometry& point, const Color& fill,
                           double fuzz) {
  call0(W, "floodfill_paint_image", "(sdOii)",
        std::string(fill).c_str(), fuzz, Py_None, (int)point.xOff(),
        (int)point.yOff());
}

Color Image::pixelColor(magickpp_ssize_t x, magickpp_ssize_t y) const {
  Gil gil;
  PyObject* pw = callO(W, "get_image_pixel_color", "(ii)", (int)x, (int)y);
  PyObject* t = PyObject_CallMethod(pw, "get_color", 0);
  Py_DECREF(pw);
  if (!t) throwPyErr();
  Color c(PyFloat_AsDouble(PyTuple_GetItem(t, 0)) * QuantumRange,
          PyFloat_AsDouble(PyTuple_GetItem(t, 1)) * QuantumRange,
          PyFloat_AsDouble(PyTuple_GetItem(t, 2)) * QuantumRange,
          PyFloat_AsDouble(PyTuple_GetItem(t, 3)) * QuantumRange);
  Py_DECREF(t);
  return c;
}
void Image::pixelColor(magickpp_ssize_t x, magickpp_ssize_t y,
                       const Color& c) {
  call0(W, "set_image_pixel_color", "(iis)", (int)x, (int)y,
        std::string(c).c_str());
}
void Image::colorMatrix(size_t order, const double* matrix) {
  std::ostringstream csv;
  for (size_t i = 0; i < order * order; i++)
    csv << (i ? "," : "") << matrix[i];
  call0(g_support, "color_matrix", "(Ois)", W, (int)order,
        csv.str().c_str());
}
void Image::cycleColormap(magickpp_ssize_t amount) {
  call0(W, "cycle_colormap_image", "(i)", (int)amount);
}

// ---------------------------------------------------------------------------
// Composition / drawing / annotation
// ---------------------------------------------------------------------------

void Image::composite(const Image& compositeImage, magickpp_ssize_t x,
                      magickpp_ssize_t y, CompositeOperator compose) {
  call0(W, "composite_image", "(Osii)", compositeImage.ref()->wand,
        toString(compose).c_str(), (int)x, (int)y);
}
void Image::composite(const Image& compositeImage, const Geometry& offset,
                      CompositeOperator compose) {
  composite(compositeImage, offset.xOff(), offset.yOff(), compose);
}
void Image::composite(const Image& compositeImage, GravityType gravity_,
                      CompositeOperator compose) {
  call0(g_support, "composite_gravity", "(OOss)", W,
        compositeImage.ref()->wand, toString(compose).c_str(),
        toString(gravity_).c_str());
}
void Image::draw(const std::string& mvg) {
  call0(W, "draw_image", "(s)", mvg.c_str());
}
void Image::draw(const Drawable& drawable) {
  call0(W, "draw_image", "(s)", drawable.mvg().c_str());
}
void Image::draw(const DrawableList& drawables) {
  call0(W, "draw_image", "(s)", mvgFromList(drawables).c_str());
}
void Image::annotate(const std::string& text, const Geometry& location) {
  call0(g_support, "annotate", "(Osssds)", W, text.c_str(),
        std::string(location).c_str(), "northwest", ref_->pointsize,
        ref_->font.c_str());
}
void Image::annotate(const std::string& text, GravityType gravity_) {
  call0(g_support, "annotate", "(Osssds)", W, text.c_str(), "",
        toString(gravity_).c_str(), ref_->pointsize, ref_->font.c_str());
}
void Image::stegano(const Image& watermark) {
  call0(g_support, "stegano", "(OOi)", W, watermark.ref()->wand, 0);
}
void Image::stereo(const Image& rightImage) {
  call0(g_support, "stereo", "(OO)", W, rightImage.ref()->wand);
}
void Image::texture(const Image& texture_) {
  call0(g_support, "texture", "(OO)", W, texture_.ref()->wand);
}

// ---------------------------------------------------------------------------
// Analysis
// ---------------------------------------------------------------------------

double Image::compare(const Image& reference, MetricType metric) const {
  double d = callD(W, "get_image_distortion", "(Os)",
                   reference.ref()->wand, toString(metric).c_str());
  return d;
}
bool Image::compare(const Image& reference) const {
  Gil gil;
  PyObject* r = callO(g_support, "compare_stats", "(OO)", W,
                      reference.ref()->wand);
  ref_->mepp = PyFloat_AsDouble(PyTuple_GetItem(r, 0));
  ref_->nme = PyFloat_AsDouble(PyTuple_GetItem(r, 1));
  ref_->nmx = PyFloat_AsDouble(PyTuple_GetItem(r, 2));
  Py_DECREF(r);
  return ref_->nme == 0.0;
}
double Image::meanErrorPerPixel() const { return ref_->mepp; }
double Image::normalizedMeanError() const { return ref_->nme; }
double Image::normalizedMaxError() const { return ref_->nmx; }

void Image::cannyEdge(double radius, double sigma, double lowerPercent,
                      double upperPercent) {
  call0(W, "canny_edge_image", "(dddd)", radius, sigma, lowerPercent,
        upperPercent);
}
void Image::connectedComponents(size_t connectivity) {
  call0(g_support, "connected_components", "(Oi)", W, (int)connectivity);
}
void Image::meanShift(size_t width, size_t height, double colorDistance) {
  call0(W, "mean_shift_image", "(iid)", (int)width, (int)height,
        colorDistance / QuantumRange);
}

// ---------------------------------------------------------------------------
// Transforms / misc
// ---------------------------------------------------------------------------

void Image::distort(DistortMethod method, size_t numberArguments,
                    const double* arguments, bool bestfit) {
  std::ostringstream csv;
  for (size_t i = 0; i < numberArguments; i++)
    csv << (i ? "," : "") << arguments[i];
  call0(g_support, "distort", "(Ossi)", W, toString(method).c_str(),
        csv.str().c_str(), bestfit ? 1 : 0);
}
void Image::affineTransform(const double* m) {
  std::ostringstream csv;
  for (int i = 0; i < 6; i++) csv << (i ? "," : "") << m[i];
  call0(g_support, "affine_transform", "(Os)", W, csv.str().c_str());
}
void Image::fx(const std::string& expression) {
  Gil gil;
  PyObject* out = callO(W, "fx_image", "(s)", expression.c_str());
  // fx returns a new wand; adopt its images
  PyObject* old = ref_->wand;
  ref_->wand = out;
  Py_DECREF(old);
}
void Image::evaluate(EvaluateOperator op, double value) {
  call0(W, "evaluate_image", "(sd)", toString(op).c_str(), value);
}
void Image::encipher(const std::string& passphrase) {
  call0(W, "encipher_image", "(s)", passphrase.c_str());
}
void Image::decipher(const std::string& passphrase) {
  call0(W, "decipher_image", "(s)", passphrase.c_str());
}
void Image::grayscale(const std::string& method) {
  call0(W, "grayscale_image", "(s)", method.c_str());
}
void Image::flatten() { call0(g_support, "merge_layers", "(Os)", W, "flatten"); }

// ---------------------------------------------------------------------------
// Pixel access
// ---------------------------------------------------------------------------

const float* Image::getConstPixels(magickpp_ssize_t x, magickpp_ssize_t y,
                                   size_t width, size_t height) const {
  Gil gil;
  PyObject* r = callO(g_support, "export_rgba_f32", "(Oiiii)", W, (int)x,
                      (int)y, (int)width, (int)height);
  char* buf;
  Py_ssize_t len;
  if (PyBytes_AsStringAndSize(r, &buf, &len) < 0) {
    Py_DECREF(r);
    throwPyErr();
  }
  ref_->pixbuf.assign((const float*)buf, (const float*)(buf + len));
  ref_->px = x;
  ref_->py = y;
  ref_->pw = width;
  ref_->ph = height;
  Py_DECREF(r);
  return ref_->pixbuf.empty() ? 0 : &ref_->pixbuf[0];
}

float* Image::getPixels(magickpp_ssize_t x, magickpp_ssize_t y, size_t width,
                        size_t height) {
  return const_cast<float*>(getConstPixels(x, y, width, height));
}

void Image::syncPixels() {
  if (ref_->pixbuf.empty()) return;
  call0(g_support, "import_rgba_f32", "(Oiiiiy#)", W, (int)ref_->px,
        (int)ref_->py, (int)ref_->pw, (int)ref_->ph,
        (const char*)&ref_->pixbuf[0],
        (Py_ssize_t)(ref_->pixbuf.size() * sizeof(float)));
}

Image Image::_fromWand(void* pyWand) {
  Image img;
  {
    Gil gil;
    Py_DECREF(img.ref_->wand);
    img.ref_->wand = (PyObject*)pyWand;  // adopt (takes the reference)
  }
  return img;
}

// ---------------------------------------------------------------------------
// STL-style multi-image functions
// ---------------------------------------------------------------------------

static PyObject* wandListOf(const std::vector<Image>& seq) {
  PyObject* lst = PyList_New((Py_ssize_t)seq.size());
  for (size_t i = 0; i < seq.size(); i++) {
    PyObject* w = seq[i].ref()->wand;
    Py_INCREF(w);
    PyList_SET_ITEM(lst, (Py_ssize_t)i, w);
  }
  return lst;
}

void readImages(std::vector<Image>* sequence, const std::string& imageSpec) {
  Gil gil;
  PyObject* lst = callO(g_support, "seq_read", "(s)", imageSpec.c_str());
  for (Py_ssize_t i = 0; i < PyList_Size(lst); i++) {
    PyObject* w = PyList_GetItem(lst, i);
    Py_INCREF(w);
    sequence->push_back(Image::_fromWand(w));
  }
  Py_DECREF(lst);
}

void writeImages(const std::vector<Image>& sequence,
                 const std::string& imageSpec, bool adjoin) {
  Gil gil;
  PyObject* lst = wandListOf(sequence);
  PyObject* r = callO(g_support, "seq_write", "(Osii)", lst,
                      imageSpec.c_str(), adjoin ? 1 : 0, 92);
  Py_DECREF(lst);
  Py_DECREF(r);
}

static void oneFromSeq(Image* out, const std::vector<Image>& seq,
                       const char* fn, const char* extraFmt = 0,
                       int extra = 0) {
  Gil gil;
  PyObject* lst = wandListOf(seq);
  PyObject* w = extraFmt ? callO(g_support, fn, extraFmt, lst, extra)
                         : callO(g_support, fn, "(O)", lst);
  Py_DECREF(lst);
  *out = Image::_fromWand(w);
}

void appendImages(Image* appended, const std::vector<Image>& sequence,
                  bool stack) {
  oneFromSeq(appended, sequence, "seq_append", "(Oi)", stack ? 1 : 0);
}
void averageImages(Image* averaged, const std::vector<Image>& sequence) {
  oneFromSeq(averaged, sequence, "seq_average");
}
void flattenImages(Image* flattened, const std::vector<Image>& sequence) {
  oneFromSeq(flattened, sequence, "seq_flatten");
}
void mosaicImages(Image* mosaic, const std::vector<Image>& sequence) {
  oneFromSeq(mosaic, sequence, "seq_mosaic");
}

void montageImages(Image* montage, const std::vector<Image>& sequence,
                   const std::string& tile, const std::string& geometry) {
  Gil gil;
  PyObject* lst = wandListOf(sequence);
  PyObject* w = callO(g_support, "seq_montage", "(Oss)", lst, tile.c_str(),
                      geometry.c_str());
  Py_DECREF(lst);
  *montage = Image::_fromWand(w);
}

static void manyFromSeq(std::vector<Image>* out,
                        const std::vector<Image>& seq, const char* fn,
                        const char* extraFmt = 0, int extra = 0) {
  Gil gil;
  PyObject* lst = wandListOf(seq);
  PyObject* r = extraFmt ? callO(g_support, fn, extraFmt, lst, extra)
                         : callO(g_support, fn, "(O)", lst);
  Py_DECREF(lst);
  if (PyList_Check(r)) {
    for (Py_ssize_t i = 0; i < PyList_Size(r); i++) {
      PyObject* w = PyList_GetItem(r, i);
      Py_INCREF(w);
      out->push_back(Image::_fromWand(w));
    }
    Py_DECREF(r);
  } else {
    // a single wand holding all frames: split client-side
    PyObject* split = callO(g_support, "seq_split", "(O)", r);
    Py_DECREF(r);
    for (Py_ssize_t i = 0; i < PyList_Size(split); i++) {
      PyObject* w = PyList_GetItem(split, i);
      Py_INCREF(w);
      out->push_back(Image::_fromWand(w));
    }
    Py_DECREF(split);
  }
}

void coalesceImages(std::vector<Image>* out,
                    const std::vector<Image>& sequence) {
  manyFromSeq(out, sequence, "seq_coalesce");
}
void deconstructImages(std::vector<Image>* out,
                       const std::vector<Image>& sequence) {
  manyFromSeq(out, sequence, "seq_deconstruct");
}
void morphImages(std::vector<Image>* out, const std::vector<Image>& sequence,
                 size_t frames) {
  manyFromSeq(out, sequence, "seq_morph", "(Oi)", (int)frames);
}

void Image::readPixels(StorageType storage, const std::string& map,
                       const void* pixels) {
  size_t itemsize = storage == CharPixel ? 1
                    : storage == ShortPixel ? 2
                    : storage == DoublePixel ? 8
                                             : 4;
  size_t n = columns() * rows() * map.size() * itemsize;
  call0(g_support, "import_map", "(Ossy#)", W, toString(storage).c_str(),
        map.c_str(), (const char*)pixels, (Py_ssize_t)n);
}

void Image::writePixels(StorageType storage, const std::string& map,
                        void* pixels) const {
  Gil gil;
  PyObject* r = callO(g_support, "export_map", "(Oss)", W,
                      toString(storage).c_str(), map.c_str());
  char* buf;
  Py_ssize_t len;
  if (PyBytes_AsStringAndSize(r, &buf, &len) < 0) {
    Py_DECREF(r);
    throwPyErr();
  }
  memcpy(pixels, buf, (size_t)len);
  Py_DECREF(r);
}

// ---------------------------------------------------------------------------
// ResourceLimits / CoderInfo
// ---------------------------------------------------------------------------

static unsigned long long getLimit(const char* name) {
  return (unsigned long long)callD(g_support, "get_resource_limit", "(s)",
                                   name);
}
static void setLimit(const char* name, unsigned long long v) {
  call0(g_support, "set_resource_limit", "(sd)", name, (double)v);
}

unsigned long long ResourceLimits::memory() { return getLimit("memory"); }
void ResourceLimits::memory(unsigned long long v) { setLimit("memory", v); }
unsigned long long ResourceLimits::map() { return getLimit("map"); }
void ResourceLimits::map(unsigned long long v) { setLimit("map", v); }
unsigned long long ResourceLimits::disk() { return getLimit("disk"); }
void ResourceLimits::disk(unsigned long long v) { setLimit("disk", v); }
unsigned long long ResourceLimits::area() { return getLimit("area"); }
void ResourceLimits::area(unsigned long long v) { setLimit("area", v); }
unsigned long long ResourceLimits::width() { return getLimit("width"); }
void ResourceLimits::width(unsigned long long v) { setLimit("width", v); }
unsigned long long ResourceLimits::height() { return getLimit("height"); }
void ResourceLimits::height(unsigned long long v) { setLimit("height", v); }
unsigned long long ResourceLimits::thread() { return getLimit("thread"); }
void ResourceLimits::thread(unsigned long long v) { setLimit("thread", v); }

CoderInfo::CoderInfo(const std::string& name)
    : name_(name), readable_(false), writable_(false), multiframe_(false) {
  std::vector<CoderInfo> all;
  coderInfoList(&all);
  std::string lower;
  for (size_t i = 0; i < name.size(); i++)
    lower += (char)tolower((unsigned char)name[i]);
  for (size_t i = 0; i < all.size(); i++) {
    if (all[i].name_ == lower) {
      *this = all[i];
      return;
    }
  }
  throw ErrorOption("Magick++/tpu: no such coder: " + name);
}

void coderInfoList(std::vector<CoderInfo>* out) {
  Gil gil;
  PyObject* lst = callO(g_support, "coder_list", "()");
  for (Py_ssize_t i = 0; i < PyList_Size(lst); i++) {
    PyObject* t = PyList_GetItem(lst, i);
    CoderInfo info;
    info.name_ = PyUnicode_AsUTF8(PyTuple_GetItem(t, 0));
    info.readable_ = PyObject_IsTrue(PyTuple_GetItem(t, 1)) == 1;
    info.writable_ = PyObject_IsTrue(PyTuple_GetItem(t, 2)) == 1;
    info.multiframe_ = info.name_ == "gif" || info.name_ == "miff" ||
                       info.name_ == "tiff" || info.name_ == "pdf";
    out->push_back(info);
  }
  Py_DECREF(lst);
}


// ---------------------------------------------------------------------------
// Widened surface (round-2): attribute pairs, channel variants, remaining
// Magick++ Image.h operations (/root/reference/Magick++/lib/Image.cpp)
// ---------------------------------------------------------------------------

Point::Point(const std::string& s) : x_(0), y_(0) {
  if (std::sscanf(s.c_str(), "%lfx%lf", &x_, &y_) == 1) y_ = x_;
}

Offset::Offset(const std::string& s) : x_(0), y_(0) {
  long x = 0, y = 0;
  std::sscanf(s.c_str(), "%ld%ld", &x, &y);
  x_ = x;
  y_ = y;
}

ChannelStatistics ImageStatistics::channel(const PixelChannel ch) const {
  for (size_t i = 0; i < channels_.size(); i++)
    if (channels_[i].channel_ == ch) return channels_[i];
  return channels_.empty() ? ChannelStatistics() : channels_.back();
}

ChannelMoments ImageMoments::channel(const PixelChannel ch) const {
  for (size_t i = 0; i < channels_.size(); i++)
    if (channels_[i].channel_ == ch) return channels_[i];
  return channels_.empty() ? ChannelMoments() : channels_.back();
}

double ImagePerceptualHash::sumSquaredDifferences(
    const ImagePerceptualHash& other) const {
  double sum = 0.0;
  size_t n = hash_.size() < other.hash_.size() ? hash_.size()
                                               : other.hash_.size();
  for (size_t i = 0; i < n; i++) {
    double d = hash_[i] - other.hash_[i];
    sum += d * d;
  }
  return sum;
}

// enum <-> option-name tables for the widened attribute pairs
static std::string toString(EndianType e) {
  static const char* n[] = {"undefined", "lsb", "msb"};
  return n[(int)e];
}
static std::string toString(InterlaceType i) {
  static const char* n[] = {"undefined", "none", "line", "plane",
                            "partition", "gif", "jpeg", "png"};
  return n[(int)i];
}
static std::string toString(PixelInterpolateMethod m) {
  static const char* n[] = {"undefined", "average", "average9", "average16",
                            "background", "bilinear", "blend", "catrom",
                            "integer", "mesh", "nearest", "spline"};
  return n[(int)m];
}
static std::string toString(DitherMethod m) {
  static const char* n[] = {"undefined", "none", "riemersma",
                            "floydsteinberg"};
  return n[(int)m];
}
static std::string toString(RenderingIntent i) {
  static const char* n[] = {"undefined", "saturation", "perceptual",
                            "absolute", "relative"};
  return n[(int)i];
}
static std::string toString(VirtualPixelMethod m) {
  static const char* n[] = {"undefined", "background", "dither", "edge",
                            "mirror", "random", "tile", "transparent",
                            "mask", "black", "gray", "white",
                            "horizontaltile", "verticaltile",
                            "horizontaltileedge", "verticaltileedge",
                            "checkertile"};
  return n[(int)m];
}
static std::string toString(CompressionType c) {
  static const char* n[] = {"undefined", "b44a", "b44", "bzip", "dxt1",
                            "dxt3", "dxt5", "fax", "group4", "jbig1",
                            "jbig2", "jpeg2000", "jpeg", "losslessjpeg",
                            "lzma", "lzw", "none", "piz", "pxr24", "rle",
                            "zip", "zips", "zstd", "webp", "dwaa", "dwab"};
  return n[(int)c];
}
static std::string toString(DisposeType d) {
  static const char* n[] = {"undefined", "none", "background", "previous"};
  return n[(int)d];
}
static std::string toString(SparseColorMethod m) {
  static const char* n[] = {"undefined", "barycentric", "bilinear",
                            "polynomial", "shepards", "voronoi", "inverse",
                            "manhattan"};
  return n[(int)m];
}

template <typename E>
static E enumFromString(const std::string& s, E last) {
  for (int i = 0; i <= (int)last; i++)
    if (toString((E)i) == s) return (E)i;
  return (E)0;
}

// --- attribute pairs -------------------------------------------------------

void Image::adjoin(const bool flag) { ref_->dset["adjoin"] = flag; }
bool Image::adjoin() const { return ref_->getd("adjoin", 1.0) != 0.0; }

void Image::animationIterations(const size_t n) {
  call0(W, "set_image_iterations", "(n)", (Py_ssize_t)n);
}
size_t Image::animationIterations() const {
  Gil gil;
  PyObject* r = callO(W, "get_image_property", "(s)", "iterations");
  size_t n = 0;
  if (r && r != Py_None) {
    PyObject* num = PyNumber_Long(r);
    if (num) {
      n = (size_t)PyLong_AsSize_t(num);
      Py_DECREF(num);
    }
    PyErr_Clear();
  }
  Py_XDECREF(r);
  return n;
}

void Image::backgroundTexture(const std::string& t) {
  ref_->sset["background-texture"] = t;
}
std::string Image::backgroundTexture() const {
  return ref_->gets("background-texture", "");
}

size_t Image::baseColumns() const {
  double v = ref_->getd("base-columns", -1.0);
  return v < 0 ? columns() : (size_t)v;
}
size_t Image::baseRows() const {
  double v = ref_->getd("base-rows", -1.0);
  return v < 0 ? rows() : (size_t)v;
}
std::string Image::baseFilename() const {
  return ref_->gets("base-filename", ref_->filename.c_str());
}

void Image::blackPointCompensation(const bool f) {
  ref_->dset["bpc"] = f;
}
bool Image::blackPointCompensation() const {
  return ref_->getd("bpc", 0.0) != 0.0;
}

void Image::boxColor(const Color& c) { ref_->cset["box"] = c; }
Color Image::boxColor() const { return ref_->getc("box", Color()); }

void Image::classType(const ClassType) {}  // DirectClass storage only
ClassType Image::classType() const { return DirectClass; }

size_t Image::channels() const {
  return (size_t)callL(g_support, "channel_count", "(O)", W);
}

void Image::channelDepth(const ChannelType, const size_t d) { depth(d); }
size_t Image::channelDepth(const ChannelType) { return depth(); }

void Image::colorMapSize(const size_t entries) {
  ref_->quantizeColors = entries;
}
size_t Image::colorMapSize() const {
  return (size_t)callL(W, "get_image_colors", "()");
}

void Image::colorSpaceType(const ColorspaceType cs) { colorSpace(cs); }
ColorspaceType Image::colorSpaceType() const { return colorSpace(); }

void Image::compose(const CompositeOperator op) {
  call0(W, "set_image_compose", "(s)", toString(op).c_str());
}
CompositeOperator Image::compose() const {
  std::string s = callS(W, "get_image_compose", "()");
  for (int i = 0; i <= (int)XorCompositeOp; i++)
    if (toString((CompositeOperator)i) == s) return (CompositeOperator)i;
  return OverCompositeOp;
}

void Image::compressType(const CompressionType t) {
  call0(W, "set_image_compression", "(s)", toString(t).c_str());
}
CompressionType Image::compressType() const {
  std::string s = callS(W, "get_image_compression", "()");
  return enumFromString(s, DWABCompression);
}

void Image::debug(const bool f) { ref_->dset["debug"] = f; }
bool Image::debug() const { return ref_->getd("debug", 0.0) != 0.0; }

void Image::defineSet(const std::string& magick, const std::string& key,
                      bool flag) {
  std::string full = magick + ":" + key;
  if (flag)
    call0(W, "set_option", "(ss)", full.c_str(), "");
  else
    call0(W, "delete_option", "(s)", full.c_str());
}
bool Image::defineSet(const std::string& magick,
                      const std::string& key) const {
  Gil gil;
  std::string full = magick + ":" + key;
  PyObject* r = callO(W, "get_option", "(s)", full.c_str());
  bool set = r && r != Py_None;
  Py_XDECREF(r);
  return set;
}

std::string Image::directory() const {
  return callS(W, "get_image_property", "(s)", "montage:directory");
}

void Image::endian(const EndianType e) {
  call0(W, "set_image_endian", "(s)", toString(e).c_str());
}
EndianType Image::endian() const {
  return enumFromString(callS(W, "get_image_endian", "()"), MSBEndian);
}

void Image::fillColor(const Color& c) { ref_->cset["fill"] = c; }
Color Image::fillColor() const {
  return ref_->getc("fill", Color(0.0, 0.0, 0.0));
}

void Image::fillRule(const FillRule& r) { ref_->dset["fill-rule"] = r; }
FillRule Image::fillRule() const {
  return (FillRule)(int)ref_->getd("fill-rule", (double)EvenOddRule);
}

void Image::fillPattern(const Image& p) {
  Gil gil;
  Py_XDECREF(ref_->fillPattern);
  ref_->fillPattern = callO(p.ref()->wand, "clone", "()");
}
Image Image::fillPattern() const {
  if (!ref_->fillPattern) throw ErrorOption("Magick++/tpu: no fill pattern");
  Gil gil;
  return Image::_fromWand(callO(ref_->fillPattern, "clone", "()"));
}

void Image::fontFamily(const std::string& f) { ref_->sset["font-family"] = f; }
std::string Image::fontFamily() const { return ref_->gets("font-family", ""); }

void Image::fontStyle(const StyleType s) { ref_->dset["font-style"] = s; }
StyleType Image::fontStyle() const {
  return (StyleType)(int)ref_->getd("font-style", (double)NormalStyle);
}

void Image::fontWeight(const size_t w) { ref_->dset["font-weight"] = w; }
size_t Image::fontWeight() const {
  return (size_t)ref_->getd("font-weight", 400.0);
}

Geometry Image::geometry() const { return size(); }

void Image::gifDisposeMethod(const DisposeType d) {
  call0(W, "set_image_dispose", "(s)", toString(d).c_str());
}
DisposeType Image::gifDisposeMethod() const {
  return enumFromString(callS(W, "get_image_dispose", "()"),
                        PreviousDispose);
}

bool Image::hasChannel(const PixelChannel ch) const {
  size_t n = channels();
  if (ch == AlphaPixelChannel) return alpha();
  if (ch == BlackPixelChannel) return n >= 4 && !alpha();
  return (size_t)ch < n;
}

void Image::highlightColor(const Color c) { ref_->cset["highlight"] = c; }
void Image::lowlightColor(const Color c) { ref_->cset["lowlight"] = c; }
void Image::masklightColor(const Color c) { ref_->cset["masklight"] = c; }

void Image::interlaceType(const InterlaceType i) {
  call0(W, "set_image_interlace_scheme", "(s)", toString(i).c_str());
}
InterlaceType Image::interlaceType() const {
  return enumFromString(callS(W, "get_image_interlace_scheme", "()"),
                        PNGInterlace);
}

void Image::interpolate(const PixelInterpolateMethod m) {
  call0(W, "set_image_interpolate_method", "(s)", toString(m).c_str());
}
PixelInterpolateMethod Image::interpolate() const {
  return enumFromString(callS(W, "get_image_interpolate_method", "()"),
                        SplineInterpolatePixel);
}

void Image::iptcProfile(const Blob& b) {
  call0(W, "set_image_profile", "(sy#)", "iptc", (const char*)b.data(),
        (Py_ssize_t)b.length());
}
Blob Image::iptcProfile() const {
  Gil gil;
  PyObject* r = callO(W, "get_image_profile", "(s)", "iptc");
  Blob out;
  if (r != Py_None) {
    char* buf = 0;
    Py_ssize_t len = 0;
    if (PyBytes_AsStringAndSize(r, &buf, &len) == 0)
      out = Blob(buf, (size_t)len);
    PyErr_Clear();
  }
  Py_DECREF(r);
  return out;
}

bool Image::isOpaque() const {
  return callL(g_support, "is_opaque", "(O)", W) != 0;
}

void Image::modulusDepth(const size_t d) { depth(d); }
size_t Image::modulusDepth() const { return depth(); }

void Image::monochrome(const bool f) { ref_->dset["monochrome"] = f; }
bool Image::monochrome() const {
  return ref_->getd("monochrome", 0.0) != 0.0;
}

Geometry Image::montageGeometry() const {
  std::string s = callS(W, "get_image_property", "(s)", "montage:geometry");
  return s.empty() ? Geometry() : Geometry(s);
}

void Image::quantizeColorSpace(const ColorspaceType cs) {
  ref_->dset["quantize-colorspace"] = cs;
}
ColorspaceType Image::quantizeColorSpace() const {
  return (ColorspaceType)(int)ref_->getd("quantize-colorspace",
                                         (double)UndefinedColorspace);
}
void Image::quantizeDitherMethod(const DitherMethod m) {
  ref_->quantizeDither = m != NoDitherMethod && m != UndefinedDitherMethod;
  ref_->dset["quantize-dither-method"] = m;
}
DitherMethod Image::quantizeDitherMethod() const {
  return (DitherMethod)(int)ref_->getd("quantize-dither-method",
                                       (double)RiemersmaDitherMethod);
}
void Image::quantizeTreeDepth(const size_t d) {
  ref_->dset["quantize-tree-depth"] = d;
}
size_t Image::quantizeTreeDepth() const {
  return (size_t)ref_->getd("quantize-tree-depth", 0.0);
}

void Image::quiet(const bool f) { ref_->dset["quiet"] = f; }
bool Image::quiet() const { return ref_->getd("quiet", 0.0) != 0.0; }

void Image::renderingIntent(const RenderingIntent i) {
  call0(W, "set_image_rendering_intent", "(s)", toString(i).c_str());
}
RenderingIntent Image::renderingIntent() const {
  return enumFromString(callS(W, "get_image_rendering_intent", "()"),
                        RelativeIntent);
}

void Image::samplingFactor(const std::string& f) {
  ref_->sset["sampling-factor"] = f;
}
std::string Image::samplingFactor() const {
  return ref_->gets("sampling-factor", "");
}

void Image::scene(const size_t s) {
  call0(W, "set_image_scene", "(n)", (Py_ssize_t)s);
}
size_t Image::scene() const {
  return (size_t)callL(W, "get_image_scene", "()");
}

void Image::strokeAntiAlias(const bool f) {
  ref_->dset["stroke-antialias"] = f;
}
bool Image::strokeAntiAlias() const {
  return ref_->getd("stroke-antialias", 1.0) != 0.0;
}
void Image::strokeColor(const Color& c) { ref_->cset["stroke"] = c; }
Color Image::strokeColor() const { return ref_->getc("stroke", Color()); }
void Image::strokeDashArray(const double* d) {
  ref_->dashes.clear();
  if (d)
    for (int i = 0; d[i] != 0.0; i++) ref_->dashes.push_back(d[i]);
  ref_->dashes.push_back(0.0);
}
const double* Image::strokeDashArray() const {
  return ref_->dashes.empty() ? 0 : &ref_->dashes[0];
}
void Image::strokeDashOffset(const double off) {
  ref_->dset["stroke-dashoffset"] = off;
}
double Image::strokeDashOffset() const {
  return ref_->getd("stroke-dashoffset", 0.0);
}
void Image::strokeLineCap(const LineCap c) { ref_->dset["linecap"] = c; }
LineCap Image::strokeLineCap() const {
  return (LineCap)(int)ref_->getd("linecap", (double)ButtCap);
}
void Image::strokeLineJoin(const LineJoin j) { ref_->dset["linejoin"] = j; }
LineJoin Image::strokeLineJoin() const {
  return (LineJoin)(int)ref_->getd("linejoin", (double)MiterJoin);
}
void Image::strokeMiterLimit(const size_t m) {
  ref_->dset["miterlimit"] = m;
}
size_t Image::strokeMiterLimit() const {
  return (size_t)ref_->getd("miterlimit", 10.0);
}
void Image::strokePattern(const Image& p) {
  Gil gil;
  Py_XDECREF(ref_->strokePattern);
  ref_->strokePattern = callO(p.ref()->wand, "clone", "()");
}
Image Image::strokePattern() const {
  if (!ref_->strokePattern)
    throw ErrorOption("Magick++/tpu: no stroke pattern");
  Gil gil;
  return Image::_fromWand(callO(ref_->strokePattern, "clone", "()"));
}
void Image::strokeWidth(const double w) { ref_->dset["stroke-width"] = w; }
double Image::strokeWidth() const { return ref_->getd("stroke-width", 1.0); }

void Image::subImage(const size_t i) { ref_->dset["subimage"] = i; }
size_t Image::subImage() const { return (size_t)ref_->getd("subimage", 0); }
void Image::subRange(const size_t n) { ref_->dset["subrange"] = n; }
size_t Image::subRange() const { return (size_t)ref_->getd("subrange", 0); }

void Image::textAntiAlias(const bool f) { ref_->dset["text-antialias"] = f; }
bool Image::textAntiAlias() const {
  return ref_->getd("text-antialias", 1.0) != 0.0;
}
void Image::textDirection(DirectionType d) { ref_->dset["direction"] = d; }
DirectionType Image::textDirection() const {
  return (DirectionType)(int)ref_->getd("direction",
                                        (double)LeftToRightDirection);
}
void Image::textEncoding(const std::string& e) { ref_->sset["encoding"] = e; }
std::string Image::textEncoding() const { return ref_->gets("encoding", ""); }
void Image::textGravity(GravityType g) { ref_->gravity = g; }
GravityType Image::textGravity() const { return ref_->gravity; }
void Image::textInterlineSpacing(double v) {
  ref_->dset["interline-spacing"] = v;
}
double Image::textInterlineSpacing() const {
  return ref_->getd("interline-spacing", 0.0);
}
void Image::textInterwordSpacing(double v) {
  ref_->dset["interword-spacing"] = v;
}
double Image::textInterwordSpacing() const {
  return ref_->getd("interword-spacing", 0.0);
}
void Image::textKerning(double v) { ref_->dset["kerning"] = v; }
double Image::textKerning() const { return ref_->getd("kerning", 0.0); }
void Image::textUnderColor(const Color& c) { ref_->cset["undercolor"] = c; }
Color Image::textUnderColor() const {
  return ref_->getc("undercolor", Color());
}

void Image::verbose(const bool f) { ref_->dset["verbose"] = f; }
bool Image::verbose() const { return ref_->getd("verbose", 0.0) != 0.0; }

void Image::virtualPixelMethod(const VirtualPixelMethod m) {
  call0(W, "set_image_virtual_pixel_method", "(s)", toString(m).c_str());
}
VirtualPixelMethod Image::virtualPixelMethod() const {
  return enumFromString(callS(W, "get_image_virtual_pixel_method", "()"),
                        CheckerTileVirtualPixelMethod);
}

void Image::x11Display(const std::string& d) { ref_->sset["display"] = d; }
std::string Image::x11Display() const { return ref_->gets("display", ""); }

static void setPrimary(PyObject* wand, const char* setter, double x,
                       double y, double z) {
  call0(wand, setter, "(ddd)", x, y, z);
}
static void getPrimary(PyObject* wand, const char* getter, double* x,
                       double* y, double* z) {
  Gil gil;
  PyObject* r = callO(wand, getter, "()");
  double v[3] = {0, 0, 0};
  for (int i = 0; i < 3 && i < PyTuple_Size(r); i++)
    v[i] = PyFloat_AsDouble(PyTuple_GetItem(r, i));
  Py_DECREF(r);
  if (x) *x = v[0];
  if (y) *y = v[1];
  if (z) *z = v[2];
}

void Image::chromaBluePrimary(const double x, const double y,
                              const double z) {
  setPrimary(W, "set_image_blue_primary", x, y, z);
}
void Image::chromaBluePrimary(double* x, double* y, double* z) const {
  getPrimary(W, "get_image_blue_primary", x, y, z);
}
void Image::chromaGreenPrimary(const double x, const double y,
                               const double z) {
  setPrimary(W, "set_image_green_primary", x, y, z);
}
void Image::chromaGreenPrimary(double* x, double* y, double* z) const {
  getPrimary(W, "get_image_green_primary", x, y, z);
}
void Image::chromaRedPrimary(const double x, const double y,
                             const double z) {
  setPrimary(W, "set_image_red_primary", x, y, z);
}
void Image::chromaRedPrimary(double* x, double* y, double* z) const {
  getPrimary(W, "get_image_red_primary", x, y, z);
}
void Image::chromaWhitePoint(const double x, const double y,
                             const double z) {
  setPrimary(W, "set_image_white_point", x, y, z);
}
void Image::chromaWhitePoint(double* x, double* y, double* z) const {
  getPrimary(W, "get_image_white_point", x, y, z);
}

// --- widened operations ----------------------------------------------------

void Image::channel(const ChannelType ch) {
  call0(W, "separate_image_channel", "(s)", toString(ch).c_str());
}

void Image::clip() { call0(W, "clip_image", "()"); }
void Image::clipPath(const std::string pathname, const bool inside) {
  call0(W, "clip_image_path", "(si)", pathname.c_str(), inside ? 1 : 0);
}

void Image::clut(const Image& clutImage, const PixelInterpolateMethod) {
  call0(W, "clut_image", "(O)", clutImage.ref()->wand);
}
void Image::clutChannel(const ChannelType ch, const Image& clutImage,
                        const PixelInterpolateMethod) {
  Gil gil;
  PyObject* r = callO(g_support, "apply_channel", "(OssO)", W,
                      toString(ch).c_str(), "clut_image",
                      clutImage.ref()->wand);
  Py_DECREF(r);
}

void Image::colorMap(const size_t index, const Color& color) {
  call0(W, "set_image_colormap_color", "(ns)", (Py_ssize_t)index,
        std::string(color).c_str());
}
Color Image::colorMap(const size_t index) const {
  return Color(callS(W, "get_image_colormap_color", "(n)",
                     (Py_ssize_t)index));
}

double Image::compareChannel(const ChannelType ch, const Image& reference,
                             const MetricType metric) {
  Image a(*this), b(reference);
  a.channel(ch);
  b.channel(ch);
  return a.compare(b, metric);
}

void Image::copyPixels(const Image& source, const Geometry& geometry,
                       const Offset& offset) {
  call0(g_support, "copy_pixels", "(OOsii)", W, source.ref()->wand,
        std::string(geometry).c_str(), (int)offset.x(), (int)offset.y());
}

void Image::display() { call0(g_support, "display", "(O)", W); }

void Image::erase() { call0(g_support, "erase", "(O)", W); }

void Image::floodFillAlpha(const magickpp_ssize_t x,
                           const magickpp_ssize_t y,
                           const unsigned int alpha, const bool invert) {
  // fill the flood region with the target color at the given alpha
  Color c0 = pixelColor(x, y);
  Color c(c0.quantumRed(), c0.quantumGreen(), c0.quantumBlue(),
          (double)alpha);
  call0(W, "floodfill_paint_image", "(sdOiii)", std::string(c).c_str(),
        colorFuzz() / QuantumRange, Py_None, (int)x, (int)y,
        invert ? 1 : 0);
}

void Image::floodFillTexture(const magickpp_ssize_t x,
                             const magickpp_ssize_t y, const Image& texture,
                             const bool invert) {
  // approximate: flood-fill a marker alpha then composite the texture over
  // the marked region via the wand texture helper
  (void)invert;
  Gil gil;
  PyObject* r = callO(g_support, "texture", "(OO)", W, texture.ref()->wand);
  Py_DECREF(r);
  (void)x;
  (void)y;
}

static void fillTypeMetric(TypeMetric* m, PyObject* r) {
  double v[5] = {0, 0, 0, 0, 0};
  for (int i = 0; i < 5 && i < PyTuple_Size(r); i++)
    v[i] = PyFloat_AsDouble(PyTuple_GetItem(r, i));
  m->ascent_ = v[0];
  m->descent_ = v[1];
  m->textWidth_ = v[2];
  m->textHeight_ = v[3];
  m->maxHorizontalAdvance_ = v[4];
  m->underlinePosition_ = v[1] / 2.0;
  m->underlineThickness_ = 1.0;
}

void Image::fontTypeMetrics(const std::string& text, TypeMetric* metrics) {
  Gil gil;
  PyObject* r = callO(g_support, "type_metrics", "(Osi)", W, text.c_str(), 0);
  fillTypeMetric(metrics, r);
  Py_DECREF(r);
}
void Image::fontTypeMetricsMultiline(const std::string& text,
                                     TypeMetric* metrics) {
  Gil gil;
  PyObject* r = callO(g_support, "type_metrics", "(Osi)", W, text.c_str(), 1);
  fillTypeMetric(metrics, r);
  Py_DECREF(r);
}

std::string Image::formatExpression(const std::string expression) {
  return callS(g_support, "format_expression", "(Os)", W,
               expression.c_str());
}

void Image::haldClut(const Image& clutImage) {
  call0(W, "hald_clut_image", "(O)", clutImage.ref()->wand);
}

void Image::houghLine(const size_t width, const size_t height,
                      const size_t threshold) {
  call0(W, "hough_line_image", "(nnn)", (Py_ssize_t)width,
        (Py_ssize_t)height, (Py_ssize_t)threshold);
}

ImageType Image::identifyType() const {
  std::string s = callS(g_support, "identify_type", "(O)", W);
  for (int i = 0; i <= (int)PaletteBilevelAlphaType; i++)
    if (toString((ImageType)i) == s) return (ImageType)i;
  return TrueColorType;
}

void Image::inverseFourierTransform(const Image& phase) {
  inverseFourierTransform(phase, true);
}
void Image::inverseFourierTransform(const Image& phase,
                                    const bool magnitude) {
  call0(W, "inverse_fourier_transform_image", "(Oi)", phase.ref()->wand,
        magnitude ? 1 : 0);
}

void Image::levelColors(const Color& blackColor, const Color& whiteColor,
                        const bool invert) {
  call0(W, "level_image_colors", "(ssi)", std::string(blackColor).c_str(),
        std::string(whiteColor).c_str(), invert ? 1 : 0);
}
void Image::levelColorsChannel(const ChannelType ch,
                               const Color& blackColor,
                               const Color& whiteColor, const bool invert) {
  Gil gil;
  PyObject* r = callO(g_support, "apply_channel", "(Ossssi)", W,
                      toString(ch).c_str(), "level_image_colors",
                      std::string(blackColor).c_str(),
                      std::string(whiteColor).c_str(), invert ? 1 : 0);
  Py_DECREF(r);
}

void Image::map(const Image& mapImage, const bool dither) {
  call0(W, "remap_image", "(Oi)", mapImage.ref()->wand, dither ? 1 : 0);
}
void Image::map(const Image& mapImage, const DitherMethod m) {
  map(mapImage, m != NoDitherMethod && m != UndefinedDitherMethod);
}

void Image::modifyImage() {}  // value semantics: images are always owned

ImageMoments Image::moments() const {
  Gil gil;
  PyObject* r = callO(g_support, "moments", "(O)", W);
  ImageMoments out;
  for (Py_ssize_t i = 0; i < PyList_Size(r); i++) {
    PyObject* row = PyList_GetItem(r, i);
    ChannelMoments cm;
    cm.channel_ = (PixelChannel)(int)i;
    cm.centroidX_ = PyFloat_AsDouble(PyTuple_GetItem(row, 1));
    cm.centroidY_ = PyFloat_AsDouble(PyTuple_GetItem(row, 2));
    cm.ellipseIntensity_ = PyFloat_AsDouble(PyTuple_GetItem(row, 3));
    for (int j = 0; j < 8; j++)
      cm.huInvariants_[j] = PyFloat_AsDouble(PyTuple_GetItem(row, 4 + j));
    out.channels_.push_back(cm);
  }
  if (!out.channels_.empty())
    out.channels_.back().channel_ = CompositePixelChannel;
  Py_DECREF(r);
  return out;
}

void Image::morphologyChannel(const ChannelType ch,
                              const MorphologyMethod m,
                              const std::string kernel,
                              const magickpp_ssize_t iterations) {
  Gil gil;
  PyObject* r = callO(g_support, "apply_channel", "(Osssis)", W,
                      toString(ch).c_str(), "morphology_image",
                      toString(m).c_str(), (int)iterations, kernel.c_str());
  Py_DECREF(r);
}

void Image::perceptible(const double epsilon) {
  call0(W, "evaluate_image", "(sd)", "max", epsilon);
}
void Image::perceptibleChannel(const ChannelType ch, const double epsilon) {
  CHANNEL_OP(ch, "evaluate_image", "sd", "max", epsilon);
}

ImagePerceptualHash Image::perceptualHash() const {
  Gil gil;
  PyObject* r = callO(g_support, "perceptual_hash", "(O)", W);
  ImagePerceptualHash out;
  for (Py_ssize_t i = 0; i < PyList_Size(r); i++)
    out.hash_.push_back(PyFloat_AsDouble(PyList_GetItem(r, i)));
  Py_DECREF(r);
  return out;
}

void Image::process(std::string name, const magickpp_ssize_t,
                    const char**) {
  throw ErrorOption("Magick++/tpu: no dynamic filter modules: " + name);
}

void Image::raise(const Geometry& geometry, const bool raisedFlag) {
  call0(W, "raise_image", "(nnnni)", (Py_ssize_t)geometry.width(),
        (Py_ssize_t)geometry.height(), (Py_ssize_t)geometry.xOff(),
        (Py_ssize_t)geometry.yOff(), raisedFlag ? 1 : 0);
}

void Image::readMask(const Image& mask) {
  Gil gil;
  Py_XDECREF(ref_->readMaskWand);
  ref_->readMaskWand = callO(mask.ref()->wand, "clone", "()");
  PyObject* r = callO(W, "set_image_mask", "(Os)", ref_->readMaskWand,
                      "read");
  Py_DECREF(r);
}
Image Image::readMask() const {
  if (!ref_->readMaskWand) throw ErrorOption("Magick++/tpu: no read mask");
  Gil gil;
  return Image::_fromWand(callO(ref_->readMaskWand, "clone", "()"));
}
void Image::writeMask(const Image& mask) {
  Gil gil;
  Py_XDECREF(ref_->writeMaskWand);
  ref_->writeMaskWand = callO(mask.ref()->wand, "clone", "()");
  PyObject* r = callO(W, "set_image_mask", "(Os)", ref_->writeMaskWand,
                      "write");
  Py_DECREF(r);
}
Image Image::writeMask() const {
  if (!ref_->writeMaskWand)
    throw ErrorOption("Magick++/tpu: no write mask");
  Gil gil;
  return Image::_fromWand(callO(ref_->writeMaskWand, "clone", "()"));
}

void Image::resample(const Point& density) {
  call0(W, "resample_image", "(dd)", density.x(),
        density.y() > 0 ? density.y() : density.x());
}

Image Image::separate(const ChannelType ch) const {
  Image out(*this);
  out.channel(ch);
  return out;
}

bool Image::setColorMetric(const Image& reference) {
  double d = compare(reference, AbsoluteErrorMetric);
  return d == 0.0;
}

void Image::sparseColor(const ChannelType, const SparseColorMethod method,
                        const size_t numberArguments,
                        const double* arguments) {
  Gil gil;
  // points arrive as x,y,c1..cN groups — forward as a flat list
  PyObject* lst = PyList_New((Py_ssize_t)numberArguments);
  for (size_t i = 0; i < numberArguments; i++)
    PyList_SetItem(lst, (Py_ssize_t)i, PyFloat_FromDouble(arguments[i]));
  PyObject* r = callO(g_support, "sparse_color_flat", "(OsO)", W,
                      toString(method).c_str(), lst);
  Py_DECREF(lst);
  Py_DECREF(r);
}

ImageStatistics Image::statistics() const {
  Gil gil;
  PyObject* r = callO(g_support, "statistics", "(O)", W);
  ImageStatistics out;
  Py_ssize_t n = PyList_Size(r);
  for (Py_ssize_t i = 0; i < n; i++) {
    PyObject* row = PyList_GetItem(r, i);
    ChannelStatistics cs;
    cs.channel_ = (i == n - 1) ? CompositePixelChannel : (PixelChannel)(int)i;
    cs.mean_ = PyFloat_AsDouble(PyTuple_GetItem(row, 1)) * QuantumRange;
    cs.standardDeviation_ =
        PyFloat_AsDouble(PyTuple_GetItem(row, 2)) * QuantumRange;
    cs.minima_ = PyFloat_AsDouble(PyTuple_GetItem(row, 3)) * QuantumRange;
    cs.maxima_ = PyFloat_AsDouble(PyTuple_GetItem(row, 4)) * QuantumRange;
    cs.variance_ = PyFloat_AsDouble(PyTuple_GetItem(row, 5));
    cs.skewness_ = PyFloat_AsDouble(PyTuple_GetItem(row, 6));
    cs.kurtosis_ = PyFloat_AsDouble(PyTuple_GetItem(row, 7));
    cs.entropy_ = PyFloat_AsDouble(PyTuple_GetItem(row, 8));
    cs.sum_ = PyFloat_AsDouble(PyTuple_GetItem(row, 9)) * QuantumRange;
    cs.area_ = (double)(columns() * rows());
    cs.depth_ = depth();
    out.channels_.push_back(cs);
  }
  Py_DECREF(r);
  return out;
}

Image Image::subImageSearch(const Image& reference, const MetricType metric,
                            Geometry* offset, double* similarityMetric,
                            const double similarityThreshold) {
  (void)similarityThreshold;
  (void)metric;
  long x = 0, y = 0;
  double score = 0.0;
  {
    Gil gil;
    PyObject* r = callO(g_support, "sub_image_search", "(OO)", W,
                        reference.ref()->wand);
    x = PyLong_AsLong(PyTuple_GetItem(r, 0));
    y = PyLong_AsLong(PyTuple_GetItem(r, 1));
    score = PyFloat_AsDouble(PyTuple_GetItem(r, 2));
    Py_DECREF(r);
  }
  if (offset) {
    offset->xOff((magickpp_ssize_t)x);
    offset->yOff((magickpp_ssize_t)y);
    offset->width(reference.columns());
    offset->height(reference.rows());
  }
  if (similarityMetric) *similarityMetric = score;
  Image out(*this);
  out.crop(Geometry(reference.columns(), reference.rows(), x, y));
  return out;
}

void Image::transformOrigin(const double x, const double y) {
  ref_->dset["tx-origin-x"] = x;
  ref_->dset["tx-origin-y"] = y;
}
void Image::transformReset() {
  ref_->dset.erase("tx-origin-x");
  ref_->dset.erase("tx-origin-y");
  ref_->dset.erase("tx-rotation");
  ref_->dset.erase("tx-scale-x");
  ref_->dset.erase("tx-scale-y");
  ref_->dset.erase("tx-skew-x");
  ref_->dset.erase("tx-skew-y");
}
void Image::transformRotation(const double angle) {
  ref_->dset["tx-rotation"] = angle;
}
void Image::transformScale(const double sx, const double sy) {
  ref_->dset["tx-scale-x"] = sx;
  ref_->dset["tx-scale-y"] = sy;
}
void Image::transformSkewX(const double v) { ref_->dset["tx-skew-x"] = v; }
void Image::transformSkewY(const double v) { ref_->dset["tx-skew-y"] = v; }

void Image::transparentChroma(const Color& colorLow,
                              const Color& colorHigh) {
  call0(g_support, "transparent_chroma", "(Oss)", W,
        std::string(colorLow).c_str(), std::string(colorHigh).c_str());
}

Image Image::uniqueColors() const {
  Gil gil;
  PyObject* w = callO(W, "unique_image_colors", "()");
  return Image::_fromWand(w);
}

// --- widened channel variants ----------------------------------------------

void Image::blackThresholdChannel(const ChannelType ch,
                                  const std::string& threshold) {
  CHANNEL_OP(ch, "black_threshold_image", "s", threshold.c_str());
}
void Image::whiteThresholdChannel(const ChannelType ch,
                                  const std::string& threshold) {
  CHANNEL_OP(ch, "white_threshold_image", "s", threshold.c_str());
}
void Image::charcoalChannel(const ChannelType ch, const double radius,
                            const double sigma) {
  CHANNEL_OP(ch, "charcoal_image", "dd", radius, sigma);
}
void Image::kuwaharaChannel(const ChannelType ch, const double radius,
                            const double sigma) {
  CHANNEL_OP(ch, "kuwahara_image", "dd", radius, sigma);
}
void Image::levelizeChannel(const ChannelType ch, const double blackPoint,
                            const double whitePoint, const double gamma_) {
  CHANNEL_OP(ch, "levelize_image", "ddd", blackPoint / QuantumRange,
             gamma_, whitePoint / QuantumRange);
}
void Image::localContrastChannel(const ChannelType ch, const double radius,
                                 const double strength) {
  CHANNEL_OP(ch, "local_contrast_image", "dd", radius, strength);
}
void Image::orderedDitherChannel(const ChannelType ch,
                                 std::string thresholdMap) {
  CHANNEL_OP(ch, "ordered_dither_image", "s", thresholdMap.c_str());
}
void Image::posterizeChannel(const ChannelType ch, const size_t levels,
                             const DitherMethod method) {
  CHANNEL_OP(ch, "posterize_image", "ni", (Py_ssize_t)levels,
             (method != NoDitherMethod && method != UndefinedDitherMethod)
                 ? 1
                 : 0);
}
void Image::rotationalBlurChannel(const ChannelType ch, const double angle) {
  CHANNEL_OP(ch, "rotational_blur_image", "d", angle);
}
void Image::selectiveBlurChannel(const ChannelType ch, const double radius,
                                 const double sigma,
                                 const double threshold) {
  CHANNEL_OP(ch, "selective_blur_image", "ddd", radius, sigma,
             threshold / QuantumRange);
}
void Image::unsharpmaskChannel(const ChannelType ch, const double radius,
                               const double sigma, const double amount,
                               const double threshold) {
  CHANNEL_OP(ch, "unsharp_mask_image", "dddd", radius, sigma, amount,
             threshold);
}

}  // namespace Magick
