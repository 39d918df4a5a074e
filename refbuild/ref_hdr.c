/* Test-oracle driver for the HEADER-packet differential campaign:
 * feed every packet of a .tpkt stream through the reference header
 * state machine (th_decode_headerin, decinfo.c:182-272), TOLERANTLY --
 * per header-phase packet, print the return code to stdout ("H <ret>"
 * lines) and keep going on errors (the reference clears any partially
 * constructed state itself, so the state machine simply waits for the
 * next acceptable header).  When headerin returns 0 (first video
 * packet), allocate the decoder and decode the remaining packets like
 * ref_fuzz does ("S <ret>" lines + out.yuv), starting with that same
 * packet.  If the accepted frame geometry exceeds a sanity area the
 * driver prints "A skip" and stops before allocation (both sides of
 * the differential apply the same guard so huge-but-legal dimensions
 * do not OOM the box).  Original driver code.
 *
 * Usage: ref_hdr in.tpkt out.yuv
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <theora/theoradec.h>

#define MAX_AREA (4096 * 4096)

static int get_u32(FILE *f, unsigned *v) {
  unsigned char b[4];
  if (fread(b, 1, 4, f) != 4) return 0;
  *v = b[0] | (b[1] << 8) | ((unsigned)b[2] << 16) | ((unsigned)b[3] << 24);
  return 1;
}
static int get_i64(FILE *f, ogg_int64_t *v) {
  unsigned char b[8];
  if (fread(b, 1, 8, f) != 8) return 0;
  ogg_uint64_t u = 0;
  int i;
  for (i = 7; i >= 0; i--) u = (u << 8) | b[i];
  *v = (ogg_int64_t)u;
  return 1;
}

int main(int argc, char **argv) {
  if (argc < 3) { fprintf(stderr, "usage: %s in.tpkt out.yuv\n", argv[0]); return 1; }
  FILE *fin = fopen(argv[1], "rb");
  FILE *fout = fopen(argv[2], "wb");
  if (!fin || !fout) { perror("open"); return 1; }
  char magic[4];
  if (fread(magic, 1, 4, fin) != 4 || memcmp(magic, "TPKT", 4)) {
    fprintf(stderr, "bad magic\n");
    return 1;
  }
  th_info ti;
  th_comment tc;
  th_setup_info *ts = NULL;
  th_info_init(&ti);
  th_comment_init(&tc);
  th_dec_ctx *dec = NULL;
  unsigned len;
  ogg_packet op;
  unsigned char *payload = NULL;
  size_t cap = 0;
  while (get_u32(fin, &len)) {
    int flags = fgetc(fin);
    ogg_int64_t gp, pn;
    if (!get_i64(fin, &gp) || !get_i64(fin, &pn)) break;
    if (len > cap) { cap = len + 65536; payload = realloc(payload, cap); }
    if (len && fread(payload, 1, len, fin) != len) break;
    memset(&op, 0, sizeof(op));
    op.packet = payload;
    op.bytes = (long)len;
    op.b_o_s = flags & 1;
    op.e_o_s = (flags >> 1) & 1;
    op.granulepos = gp;
    op.packetno = pn;
    if (dec == NULL) {
      int ret = th_decode_headerin(&ti, &tc, &ts, &op);
      printf("H %d\n", ret);
      if (ret != 0) continue; /* consumed a header, or rejected: next packet */
      /* First video packet: alloc and fall through to decode THIS packet. */
      if ((long)ti.frame_width * ti.frame_height > MAX_AREA) {
        printf("A skip\n");
        break;
      }
      dec = th_decode_alloc(&ti, ts);
      th_setup_free(ts);
      ts = NULL;
      if (!dec) { printf("A fail\n"); break; }
    }
    ogg_int64_t granout = 0;
    int ret = th_decode_packetin(dec, &op, &granout);
    printf("S %d\n", ret);
    if (ret == 0 || ret == TH_DUPFRAME) {
      th_ycbcr_buffer ycbcr;
      th_decode_ycbcr_out(dec, ycbcr);
      int pli, row;
      for (pli = 0; pli < 3; pli++)
        for (row = 0; row < ycbcr[pli].height; row++)
          fwrite(ycbcr[pli].data + (ptrdiff_t)row * ycbcr[pli].stride, 1,
                 (size_t)ycbcr[pli].width, fout);
    }
  }
  if (ts) th_setup_free(ts);
  if (dec) th_decode_free(dec);
  th_comment_clear(&tc);
  th_info_clear(&ti);
  free(payload);
  fclose(fin);
  fclose(fout);
  return 0;
}
