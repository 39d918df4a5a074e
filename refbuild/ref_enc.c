/* Test-oracle driver: encode raw I420 frames with the reference libtheora and
 * dump all packets (3 headers + data packets) into a simple framed ".tpkt"
 * stream our framework's tests consume. Original driver code (not from the
 * reference tree); links against reference objects built from /root/reference.
 *
 * Usage: ref_enc W H NFRAMES QUALITY KF_FREQ in.i420 out.tpkt [bitrate]
 * tpkt format: magic "TPKT"; per packet: u32le len, u8 flags(b_o_s|e_o_s<<1),
 * i64le granulepos, i64le packetno, payload bytes.
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <theora/theoraenc.h>

static void put_u32(FILE *f, unsigned v) {
  unsigned char b[4] = {v & 255, (v >> 8) & 255, (v >> 16) & 255, (v >> 24) & 255};
  fwrite(b, 1, 4, f);
}
static void put_i64(FILE *f, ogg_int64_t v) {
  int i;
  for (i = 0; i < 8; i++) fputc((int)((v >> (8 * i)) & 255), f);
}
static void put_packet(FILE *f, ogg_packet *op) {
  put_u32(f, (unsigned)op->bytes);
  fputc((op->b_o_s ? 1 : 0) | (op->e_o_s ? 2 : 0), f);
  put_i64(f, op->granulepos);
  put_i64(f, op->packetno);
  fwrite(op->packet, 1, (size_t)op->bytes, f);
}

int main(int argc, char **argv) {
  if (argc < 8) {
    fprintf(stderr, "usage: %s W H NFRAMES QUALITY KF_FREQ in.i420 out.tpkt [bitrate]\n", argv[0]);
    return 1;
  }
  int w = atoi(argv[1]), h = atoi(argv[2]), nframes = atoi(argv[3]);
  int quality = atoi(argv[4]);
  int kf_freq = atoi(argv[5]);
  int bitrate = argc > 8 ? atoi(argv[8]) : 0;
  int pw = argc > 9 ? atoi(argv[9]) : 0;
  int ph = argc > 10 ? atoi(argv[10]) : 0;
  int px = argc > 11 ? atoi(argv[11]) : 0;
  int py = argc > 12 ? atoi(argv[12]) : 0;
  int fmt = argc > 13 ? atoi(argv[13]) : 0; /* 0=420, 2=422, 3=444 */
  FILE *fin = fopen(argv[6], "rb");
  FILE *fout = fopen(argv[7], "wb");
  if (!fin || !fout) { perror("open"); return 1; }
  if ((w | h) & 15) { fprintf(stderr, "W,H must be multiples of 16\n"); return 1; }

  th_info ti;
  th_info_init(&ti);
  ti.frame_width = w;
  ti.frame_height = h;
  ti.pic_width = pw ? pw : w;
  ti.pic_height = ph ? ph : h;
  ti.pic_x = px;
  ti.pic_y = py;
  ti.fps_numerator = 30;
  ti.fps_denominator = 1;
  ti.aspect_numerator = 1;
  ti.aspect_denominator = 1;
  ti.colorspace = TH_CS_UNSPECIFIED;
  ti.pixel_fmt = fmt == 2 ? TH_PF_422 : (fmt == 3 ? TH_PF_444 : TH_PF_420);
  ti.quality = quality;
  ti.target_bitrate = bitrate;
  ti.keyframe_granule_shift = 6;

  th_enc_ctx *enc = th_encode_alloc(&ti);
  if (!enc) { fprintf(stderr, "th_encode_alloc failed\n"); return 1; }
  if (kf_freq > 0) {
    ogg_uint32_t v = (ogg_uint32_t)kf_freq;
    th_encode_ctl(enc, TH_ENCCTL_SET_KEYFRAME_FREQUENCY_FORCE, &v, sizeof(v));
  }

  /* Optional 2-pass driving via env vars (protocol per the reference's
   * encoder_example.c:1127-1226): REF_2PASS_OUT=<path> runs pass 1 and
   * writes the OT2P metrics file; REF_2PASS_IN=<path> runs pass 2
   * consuming it. */
  const char *tp_out = getenv("REF_2PASS_OUT");
  const char *tp_in = getenv("REF_2PASS_IN");
  FILE *tpf = NULL;
  if (tp_out) {
    unsigned char *tb;
    int tn;
    tpf = fopen(tp_out, "wb");
    if (!tpf) { perror("2pass out"); return 1; }
    tn = th_encode_ctl(enc, TH_ENCCTL_2PASS_OUT, &tb, sizeof(tb));
    if (tn < 0) { fprintf(stderr, "2PASS_OUT init failed\n"); return 1; }
    fwrite(tb, 1, (size_t)tn, tpf);
  } else if (tp_in) {
    tpf = fopen(tp_in, "rb");
    if (!tpf) { perror("2pass in"); return 1; }
  }

  fwrite("TPKT", 1, 4, fout);
  ogg_packet op;
  th_comment tc;
  th_comment_init(&tc);
  while (th_encode_flushheader(enc, &tc, &op) > 0) put_packet(fout, &op);
  th_comment_clear(&tc);

  int cw = fmt ? (fmt == 3 ? w : w / 2) : w / 2;
  int ch = fmt ? h : h / 2;
  size_t ysz = (size_t)w * h, csz = (size_t)cw * ch;
  unsigned char *buf = malloc(ysz + 2 * csz);
  th_ycbcr_buffer ycbcr;
  int f;
  for (f = 0; f < nframes; f++) {
    if (fread(buf, 1, ysz + 2 * csz, fin) != ysz + 2 * csz) {
      fprintf(stderr, "short read at frame %d\n", f);
      return 1;
    }
    ycbcr[0].width = w; ycbcr[0].height = h; ycbcr[0].stride = w; ycbcr[0].data = buf;
    ycbcr[1].width = cw; ycbcr[1].height = ch; ycbcr[1].stride = cw; ycbcr[1].data = buf + ysz;
    ycbcr[2].width = cw; ycbcr[2].height = ch; ycbcr[2].stride = cw; ycbcr[2].data = buf + ysz + csz;
    if (tp_in) {
      for (;;) {
        unsigned char tbuf[80];
        int want = th_encode_ctl(enc, TH_ENCCTL_2PASS_IN, NULL, 0);
        if (want < 0) { fprintf(stderr, "2PASS_IN query failed\n"); return 1; }
        if (want == 0) break;
        if (want > (int)sizeof(tbuf)) want = (int)sizeof(tbuf);
        int got = (int)fread(tbuf, 1, (size_t)want, tpf);
        if (got <= 0) { fprintf(stderr, "2-pass file short\n"); return 1; }
        if (th_encode_ctl(enc, TH_ENCCTL_2PASS_IN, tbuf, (size_t)got) < 0) {
          fprintf(stderr, "2PASS_IN feed failed\n");
          return 1;
        }
      }
    }
    int ret = th_encode_ycbcr_in(enc, ycbcr);
    if (ret != 0) { fprintf(stderr, "ycbcr_in=%d at frame %d\n", ret, f); return 1; }
    if (tp_out) {
      unsigned char *tb;
      int tn = th_encode_ctl(enc, TH_ENCCTL_2PASS_OUT, &tb, sizeof(tb));
      if (tn < 0) { fprintf(stderr, "2PASS_OUT failed\n"); return 1; }
      fwrite(tb, 1, (size_t)tn, tpf);
    }
    while (th_encode_packetout(enc, f == nframes - 1, &op) > 0) put_packet(fout, &op);
  }
  if (tp_out) {
    unsigned char *tb;
    int tn = th_encode_ctl(enc, TH_ENCCTL_2PASS_OUT, &tb, sizeof(tb));
    if (tn < 0) { fprintf(stderr, "2PASS_OUT summary failed\n"); return 1; }
    fseek(tpf, 0, SEEK_SET);
    fwrite(tb, 1, (size_t)tn, tpf);
  }
  if (tpf) fclose(tpf);
  th_encode_free(enc);
  fclose(fin);
  fclose(fout);
  return 0;
}
