// End-to-end exercise of the Magick++ compatibility layer (built and run
// by tests/test_magickpp.py).  Prints "key=value" lines for the test to
// assert against; exits nonzero on any Magick::Exception.

#include <Magick++.h>

#include <cstdio>
#include <cstring>

using namespace Magick;

int main(int argc, char** argv) {
  const char* outdir = argc > 1 ? argv[1] : ".";
  try {
    InitializeMagick(argv[0]);

    // Geometry value semantics (pure C++, no interpreter involved)
    Geometry g("120x80+5-7!");
    printf("geom_w=%zu\n", g.width());
    printf("geom_h=%zu\n", g.height());
    printf("geom_x=%ld\n", (long)g.xOff());
    printf("geom_y=%ld\n", (long)g.yOff());
    printf("geom_aspect=%d\n", g.aspect() ? 1 : 0);
    printf("geom_str=%s\n", std::string(g).c_str());

    // Color: named colors resolve through the framework's color DB
    Color red("red");
    printf("red_q=%g\n", red.quantumRed());
    printf("green_q=%g\n", red.quantumGreen());

    // Canvas construction + attributes
    Image canvas(Geometry(64, 48), Color("white"));
    printf("cols=%zu\n", canvas.columns());
    printf("rows=%zu\n", canvas.rows());

    // Pseudo-coder read + pipeline ops
    Image img("gradient:black-white");
    img.resize(Geometry("32x32!"));
    printf("resized=%zux%zu\n", img.columns(), img.rows());
    img.gaussianBlur(0.0, 1.0);
    img.negate();
    img.flip();
    img.normalize();
    img.colorSpace(GRAYColorspace);
    printf("colorspace=%s\n", img.colorSpaceName().c_str());

    // Pixel access round trip
    Image px(Geometry(8, 8), Color("black"));
    px.pixelColor(3, 4, Color("red"));
    Color got = px.pixelColor(3, 4);
    printf("pixel_r=%d\n", (int)(got.quantumRed() / QuantumRange * 255 + 0.5));
    printf("pixel_g=%d\n", (int)(got.quantumGreen() / QuantumRange * 255 + 0.5));

    const float* buf = px.getConstPixels(0, 0, 8, 8);
    printf("buf34_r=%g\n", buf[(4 * 8 + 3) * 4 + 0]);

    float* wbuf = px.getPixels(0, 0, 8, 8);
    wbuf[(0 * 8 + 0) * 4 + 2] = 1.0f;  // blue channel of (0,0)
    px.syncPixels();
    Color b00 = px.pixelColor(0, 0);
    printf("sync_b=%d\n", (int)(b00.quantumBlue() / QuantumRange * 255 + 0.5));

    // Composite + gravity
    Image base(Geometry(32, 32), Color("blue"));
    Image overlay(Geometry(8, 8), Color("yellow"));
    base.composite(overlay, CenterGravity, OverCompositeOp);
    Color mid = base.pixelColor(16, 16);
    printf("comp_r=%d\n", (int)(mid.quantumRed() / QuantumRange * 255 + 0.5));

    // Compare: identical images have zero distortion
    Image a(Geometry(16, 16), Color("gray20"));
    Image b = a;  // deep copy
    printf("rmse_same=%g\n", a.compare(b, RootMeanSquaredErrorMetric));
    b.negate();
    double d = a.compare(b, RootMeanSquaredErrorMetric);
    printf("rmse_diff_pos=%d\n", d > 0.01 ? 1 : 0);

    // Draw + annotate
    Image dr(Geometry(40, 40), Color("white"));
    dr.draw("fill red rectangle 5,5 20,20");
    Color r10 = dr.pixelColor(10, 10);
    printf("draw_r=%d\n", (int)(r10.quantumRed() / QuantumRange * 255 + 0.5));
    printf("draw_g=%d\n", (int)(r10.quantumGreen() / QuantumRange * 255 + 0.5));
    dr.annotate("Hi", Geometry(0, 0, 2, 2));

    // Drawable object list (Magick++/lib/Drawable.h style)
    Image dl(Geometry(40, 40), Color("white"));
    DrawableList objs;
    objs.push_back(DrawableFillColor("blue"));
    objs.push_back(DrawableStrokeColor("none"));
    objs.push_back(DrawableCircle(20, 20, 20, 12));
    objs.push_back(DrawableFillColor("lime"));
    objs.push_back(DrawableRectangle(0, 0, 6, 6));
    dl.draw(objs);
    Color c20 = dl.pixelColor(20, 20);
    Color c03 = dl.pixelColor(3, 3);
    printf("dlist_b=%d\n",
           (int)(c20.quantumBlue() / QuantumRange * 255 + 0.5));
    printf("dlist_g=%d\n",
           (int)(c03.quantumGreen() / QuantumRange * 255 + 0.5));
    CoordinateList tri;
    tri.push_back(Coordinate(2, 38));
    tri.push_back(Coordinate(38, 38));
    tri.push_back(Coordinate(20, 25));
    dl.draw(DrawablePolygon(tri));

    // Effects smoke: each must run without throwing
    Image fx1("gradient:red-blue");
    fx1.resize(Geometry("24x24!"));
    fx1.charcoal(0, 1.0);
    fx1.edge(1.0);
    fx1.emboss(0, 1.0);
    fx1.oilPaint(2.0);
    fx1.sepiaTone(0.8 * QuantumRange);
    fx1.solarize(0.5 * QuantumRange);
    fx1.swirl(45.0);
    fx1.implode(0.3);
    fx1.addNoise(GaussianNoise);
    fx1.blur(0, 1.0);
    fx1.sharpen(0, 1.0);
    fx1.unsharpmask(0, 1.0, 1.0, 0.02);
    fx1.despeckle();
    fx1.medianFilter(1.0);
    fx1.equalize();
    fx1.gamma(1.2);
    fx1.level(0.05 * QuantumRange, 0.95 * QuantumRange, 1.0);
    fx1.modulate(110, 90, 100);
    fx1.brightnessContrast(5, 5);
    fx1.sigmoidalContrast(true, 3.0);
    fx1.contrastStretch(0.02, 0.01);
    fx1.threshold(0.5 * QuantumRange);
    fx1.trim();
    printf("effects_ok=1\n");

    // evaluate / fx expression VM
    Image ev(Geometry(8, 8), Color("gray50"));
    ev.evaluate(MultiplyEvaluateOperator, 0.5);
    ev.fx("u*2");
    printf("fx_ok=1\n");

    // File + blob I/O round trip
    std::string path = std::string(outdir) + "/magickpp_demo.png";
    Image out("gradient:green-black");
    out.resize(Geometry("20x10!"));
    out.write(path);
    Image back(path);
    printf("io_roundtrip=%zux%zu\n", back.columns(), back.rows());

    Blob blob;
    out.magick("png");
    out.write(&blob);
    printf("blob_len_pos=%d\n", blob.length() > 100 ? 1 : 0);
    Image fromBlob(blob);
    printf("blob_cols=%zu\n", fromBlob.columns());

    // Attribute/property + signature
    out.attribute("demo:note", "tpu");
    printf("attr=%s\n", out.attribute("demo:note").c_str());
    printf("siglen=%zu\n", out.signature().size());

    // STL-style multi-image functions
    std::vector<Image> seq;
    seq.push_back(Image(Geometry(10, 8), Color("gray20")));
    seq.push_back(Image(Geometry(10, 8), Color("gray50")));
    seq.push_back(Image(Geometry(10, 8), Color("gray80")));
    Image appended;
    appendImages(&appended, seq, false);
    printf("append=%zux%zu\n", appended.columns(), appended.rows());
    Image avg;
    averageImages(&avg, seq);
    Color ac = avg.pixelColor(5, 4);
    printf("avg_g=%d\n", (int)(ac.quantumGreen() / QuantumRange * 255 + 0.5));
    Image flat;
    flattenImages(&flat, seq);
    printf("flat=%zux%zu\n", flat.columns(), flat.rows());
    std::vector<Image> morphed;
    morphImages(&morphed, seq, 1);
    printf("morph_n=%zu\n", morphed.size());
    std::string mpath = std::string(outdir) + "/seq.miff";
    writeImages(seq, mpath, true);
    std::vector<Image> back2;
    readImages(&back2, mpath);
    printf("seq_n=%zu\n", back2.size());

    // channel-scoped ops: negate only the red channel of solid teal
    Image chimg(Geometry(6, 6), Color("rgba(0,128,128,1)"));
    chimg.negateChannel(RedChannel);
    Color chc = chimg.pixelColor(3, 3);
    printf("ch_r=%d\n", (int)(chc.quantumRed() / QuantumRange * 255 + 0.5));
    printf("ch_g=%d\n", (int)(chc.quantumGreen() / QuantumRange * 255 + 0.5));

    // --- widened surface (round 2) ---

    // attribute pairs
    Image att(Geometry(10, 10), Color("gray50"));
    att.adjoin(false);
    printf("adjoin=%d\n", att.adjoin() ? 1 : 0);
    att.scene(7);
    printf("scene=%zu\n", att.scene());
    att.endian(MSBEndian);
    printf("endian=%d\n", (int)att.endian());
    att.interlaceType(PlaneInterlace);
    printf("interlace=%d\n", (int)att.interlaceType());
    att.interpolate(BilinearInterpolatePixel);
    printf("interp=%d\n", (int)att.interpolate());
    att.virtualPixelMethod(TileVirtualPixelMethod);
    printf("vpm=%d\n", (int)att.virtualPixelMethod());
    att.renderingIntent(PerceptualIntent);
    printf("intent=%d\n", (int)att.renderingIntent());
    att.compose(MultiplyCompositeOp);
    printf("compose_mult=%d\n", att.compose() == MultiplyCompositeOp ? 1 : 0);
    att.strokeWidth(2.5);
    att.fontWeight(700);
    att.textKerning(1.5);
    printf("strokew=%g\n", att.strokeWidth());
    printf("fontw=%zu\n", att.fontWeight());
    printf("kern=%g\n", att.textKerning());
    att.strokeColor(Color("blue"));
    printf("strokecol_b=%g\n", att.strokeColor().quantumBlue() / QuantumRange);
    double dashes[3] = {4.0, 2.0, 0.0};
    att.strokeDashArray(dashes);
    printf("dash0=%g\n", att.strokeDashArray()[0]);
    att.defineSet("png", "compression-level", true);
    printf("defset=%d\n", att.defineSet("png", "compression-level") ? 1 : 0);
    double cx, cy, cz;
    att.chromaRedPrimary(0.64, 0.33, 0.03);
    att.chromaRedPrimary(&cx, &cy, &cz);
    printf("chroma_rx=%g\n", cx);
    printf("channels=%zu\n", att.channels());
    printf("classtype=%d\n", (int)att.classType());

    // stats / moments / phash
    Image st("gradient:black-white");
    st.resize(Geometry("16x16!"));
    ImageStatistics stats = st.statistics();
    double mean01 = stats.channel().mean() / QuantumRange;
    printf("stat_mean_mid=%d\n", (mean01 > 0.4 && mean01 < 0.6) ? 1 : 0);
    ImageMoments mom = st.moments();
    printf("mom_cx_pos=%d\n", mom.channel().centroidX() > 0 ? 1 : 0);
    ImagePerceptualHash ph = st.perceptualHash();
    printf("phash_n=%zu\n", ph.hash_.size());
    printf("phash_self=%g\n", ph.sumSquaredDifferences(ph));

    // erase / isOpaque / formatExpression
    Image er(Geometry(5, 5), Color("red"));
    printf("opaque=%d\n", er.isOpaque() ? 1 : 0);
    er.backgroundColor(Color("blue"));
    er.erase();
    Color ec = er.pixelColor(2, 2);
    printf("erase_b=%d\n",
           (int)(ec.quantumBlue() / QuantumRange * 255 + 0.5));
    printf("fmtexpr=%s\n", er.formatExpression("%wx%h").c_str());
    printf("identtype=%d\n", (int)er.identifyType() != 0 ? 1 : 0);

    // haldClut identity leaves colors unchanged
    Image hc(Geometry(4, 4), Color("rgb(200,60,30)"));
    Image ident("hald:8");
    hc.haldClut(ident);
    Color hcc = hc.pixelColor(1, 1);
    printf("hald_r=%d\n", (int)(hcc.quantumRed() / QuantumRange * 255 + 0.5));

    // channel extraction + separate + uniqueColors
    Image sep(Geometry(4, 4), Color("rgb(255,128,0)"));
    Image rch = sep.separate(RedChannel);
    printf("sep_r=%d\n",
           (int)(rch.pixelColor(0, 0).quantumRed() / QuantumRange * 255
                 + 0.5));
    Image uniq = sep.uniqueColors();
    printf("uniq_w=%zu\n", uniq.columns());

    // copyPixels
    Image dst(Geometry(8, 8), Color("black"));
    Image srcp(Geometry(4, 4), Color("white"));
    dst.copyPixels(srcp, Geometry(2, 2, 0, 0), Offset(5, 5));
    printf("copy_w=%d\n",
           (int)(dst.pixelColor(5, 5).quantumRed() / QuantumRange * 255
                 + 0.5));
    printf("copy_b=%d\n",
           (int)(dst.pixelColor(0, 0).quantumRed() / QuantumRange * 255
                 + 0.5));

    // raise + levelColors + compareChannel
    Image rs(Geometry(20, 20), Color("gray50"));
    rs.raise(Geometry(3, 3), true);
    Image lc(Geometry(4, 4), Color("gray50"));
    lc.levelColors(Color("black"), Color("white"), true);
    Image cmpa(Geometry(4, 4), Color("red"));
    Image cmpb(Geometry(4, 4), Color("red"));
    double chdist = cmpa.compareChannel(GreenChannel, cmpb,
                                        RootMeanSquaredErrorMetric);
    printf("chcmp_zero=%d\n", chdist == 0.0 ? 1 : 0);
    printf("setmetric=%d\n", cmpa.setColorMetric(cmpb) ? 1 : 0);

    // fontTypeMetrics
    TypeMetric tm;
    att.fontTypeMetrics("Hello", &tm);
    printf("tm_w_pos=%d\n", tm.textWidth() > 0 ? 1 : 0);
    printf("tm_asc_pos=%d\n", tm.ascent() > 0 ? 1 : 0);

    // subImageSearch: find a structured patch inside a dark canvas
    Image hay(Geometry(16, 16), Color("black"));
    Image patch("gradient:white-black");
    patch.resize(Geometry("4x4!"));
    hay.copyPixels(patch, Geometry(4, 4, 0, 0), Offset(9, 6));
    Geometry foundAt;
    double simScore = 0.0;
    Image found = hay.subImageSearch(patch, RootMeanSquaredErrorMetric,
                                     &foundAt, &simScore);
    printf("search_x=%ld\n", (long)foundAt.xOff());
    printf("search_y=%ld\n", (long)foundAt.yOff());
    printf("search_w=%zu\n", found.columns());

    // transparentChroma
    Image tc(Geometry(4, 4), Color("blue"));
    tc.alpha(true);
    tc.transparentChroma(Color("rgb(0,0,200)"), Color("rgb(40,40,255)"));
    printf("tchroma_a=%g\n",
           tc.pixelColor(1, 1).quantumAlpha() / QuantumRange);

    // ResourceLimits + CoderInfo services
    ResourceLimits::width(1 << 20);
    printf("limit_w=%llu\n", ResourceLimits::width());
    std::vector<CoderInfo> coders;
    coderInfoList(&coders);
    printf("coders_n_pos=%d\n", coders.size() > 80 ? 1 : 0);
    CoderInfo png("PNG");
    printf("png_rw=%d%d\n", png.isReadable() ? 1 : 0,
           png.isWritable() ? 1 : 0);

    // Exceptions surface as Magick::Exception
    int threw = 0;
    try {
      Image bad("/nonexistent/nope.png");
    } catch (const Exception& e) {
      threw = 1;
    }
    printf("throws=%d\n", threw);

    printf("done=1\n");
    return 0;
  } catch (const Exception& e) {
    fprintf(stderr, "MagickException: %s\n", e.what());
    return 1;
  }
}
