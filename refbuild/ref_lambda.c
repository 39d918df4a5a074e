/* Dumps the reference encoder's R/D lambda per (qti, qi) so our trellis
 * tokenizer can use the exact values (rate.c:151-174 computes
 * lambda = 0.2125*qavg^2 from the measured-RPSD weighted quantizer
 * average; we read the result instead of re-deriving the tables).
 *
 * Usage: ref_lambda [pixel_fmt]   -> prints "qti qi lambda" lines.
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <ogg/ogg.h>
#include "theora/theoraenc.h"
#include "encint.h"

int main(int argc, char **argv) {
  th_info info;
  th_enc_ctx *enc;
  int fmt = argc > 1 ? atoi(argv[1]) : TH_PF_420;
  int qti, qi;
  th_info_init(&info);
  info.frame_width = 64;
  info.frame_height = 64;
  info.pic_width = 64;
  info.pic_height = 64;
  info.pic_x = 0;
  info.pic_y = 0;
  info.fps_numerator = 30;
  info.fps_denominator = 1;
  info.pixel_fmt = (th_pixel_fmt)fmt;
  info.quality = 48;
  info.target_bitrate = 0;
  info.keyframe_granule_shift = 6;
  enc = th_encode_alloc(&info);
  if (!enc) { fprintf(stderr, "alloc failed\n"); return 1; }
  for (qti = 0; qti < 2; qti++) {
    for (qi = 0; qi < 64; qi++) {
      enc->state.qis[0] = qi;
      oc_enc_calc_lambda(enc, qti);
      printf("%d %d %d\n", qti, qi, enc->lambda);
    }
  }
  th_encode_free(enc);
  return 0;
}
