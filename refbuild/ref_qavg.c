/* Dumps the reference encoder's log-average quantizer table log_qavg
 * (enquant.c:328 oc_enquant_qavg_init: RPSD-weighted Laplacian pooling)
 * per pixel format, as float log2 values, so our rate controller's
 * bits = scale * npixels * 2^(-exp*(log_q-2)) model uses the same
 * quantizer metric the reference's exponents were fitted against.
 *
 * Usage: ref_qavg   -> prints "fmt qti qi log2_qavg" lines.
 */
#include <stdio.h>
#include <stdlib.h>
#include <ogg/ogg.h>
#include "theora/theoraenc.h"
#include "encint.h"

int main(void) {
  static const int fmts[3] = {TH_PF_420, TH_PF_422, TH_PF_444};
  int fi, qti, qi;
  for (fi = 0; fi < 3; fi++) {
    th_info info;
    th_enc_ctx *enc;
    th_info_init(&info);
    info.frame_width = 64;
    info.frame_height = 64;
    info.pic_width = 64;
    info.pic_height = 64;
    info.fps_numerator = 30;
    info.fps_denominator = 1;
    info.pixel_fmt = (th_pixel_fmt)fmts[fi];
    info.quality = 48;
    info.keyframe_granule_shift = 6;
    enc = th_encode_alloc(&info);
    if (!enc) { fprintf(stderr, "alloc failed\n"); return 1; }
    for (qti = 0; qti < 2; qti++)
      for (qi = 0; qi < 64; qi++)
        printf("%d %d %d %.12f\n", fmts[fi], qti, qi,
               enc->log_qavg[qti][qi] / 144115188075855872.0 /* 2^57 */);
    th_encode_free(enc);
  }
  return 0;
}
