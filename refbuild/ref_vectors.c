/* Test-oracle driver: dump reference-internal tables and kernel outputs as
 * golden vectors for unit tests. Original driver code linking against the
 * reference objects.
 *
 * Usage: ref_vectors OUTDIR
 * Emits:
 *   dequant_def.bin   - 64(qi)x3(pli)x2(qti)x64 u16le dequant tables, default matrices
 *   idct_cases.bin    - for each case: 64 i16le input (zigzag-natural? natural order),
 *                       i32le last_zzi, 64 i16le output
 *   fdct_cases.bin    - 64 i16le input residual, 64 i16le output (zigzag order)
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <ogg/ogg.h>
#include "theora/theoraenc.h"
#include "internal.h"
#include "quant.h"
#include "dct.h"

/* from reference lib (non-static) */
void oc_idct8x8_c(ogg_int16_t _y[64], ogg_int16_t _x[64], int _last_zzi);
void oc_enc_fdct8x8_c(ogg_int16_t _y[64], const ogg_int16_t _x[64]);
extern const th_quant_info TH_DEF_QUANT_INFO;
extern const th_quant_info TH_VP31_QUANT_INFO;

static void put_u16(FILE *f, unsigned v) {
  fputc(v & 255, f);
  fputc((v >> 8) & 255, f);
}
static void put_i16(FILE *f, int v) { put_u16(f, (unsigned)(v & 0xFFFF)); }
static void put_i32(FILE *f, long v) {
  int i;
  for (i = 0; i < 4; i++) fputc((int)((v >> (8 * i)) & 255), f);
}

static unsigned rng_state = 0x12345678u;
static unsigned rng(void) {
  rng_state ^= rng_state << 13;
  rng_state ^= rng_state >> 17;
  rng_state ^= rng_state << 5;
  return rng_state;
}

static void dump_dequant(const char *dir, const char *name, const th_quant_info *qinfo) {
  char path[1024];
  ogg_uint16_t *tables[64][3][2];
  /* backing storage: worst case 64*3*2 distinct tables */
  static ogg_uint16_t storage[64 * 3 * 2][64];
  int qi, pli, qti, ci, n = 0;
  for (qi = 0; qi < 64; qi++)
    for (pli = 0; pli < 3; pli++)
      for (qti = 0; qti < 2; qti++) tables[qi][pli][qti] = storage[n++];
  int pp_dc_scale[64];
  oc_dequant_tables_init(tables, pp_dc_scale, qinfo);
  snprintf(path, sizeof(path), "%s/%s", dir, name);
  FILE *f = fopen(path, "wb");
  for (qi = 0; qi < 64; qi++)
    for (pli = 0; pli < 3; pli++)
      for (qti = 0; qti < 2; qti++)
        for (ci = 0; ci < 64; ci++) put_u16(f, tables[qi][pli][qti][ci]);
  for (qi = 0; qi < 64; qi++) put_i32(f, pp_dc_scale[qi]);
  fclose(f);
}

int main(int argc, char **argv) {
  if (argc < 2) { fprintf(stderr, "usage: %s OUTDIR\n", argv[0]); return 1; }
  const char *dir = argv[1];
  char path[1024];

  dump_dequant(dir, "dequant_def.bin", &TH_DEF_QUANT_INFO);
  dump_dequant(dir, "dequant_vp31.bin", &TH_VP31_QUANT_INFO);

  /* iDCT cases: inputs in natural (row-major) coefficient order as
   * oc_idct8x8 expects (it reads x[] natural order after the decoder
   * de-zigzags). Cover last_zzi in {1,2,3,6,10,30,64} with values in the
   * legal +-580*dequant range (use +-8100 to bound 16-bit behavior). */
  snprintf(path, sizeof(path), "%s/idct_cases.bin", dir);
  FILE *f = fopen(path, "wb");
  int zzis[] = {1, 2, 3, 4, 6, 10, 28, 40, 64};
  int nz, c, i;
  for (nz = 0; nz < (int)(sizeof(zzis) / sizeof(zzis[0])); nz++) {
    for (c = 0; c < 64; c++) {
      ogg_int16_t x[64], y[64], xcopy[64];
      int last_zzi = zzis[nz];
      memset(x, 0, sizeof(x));
      /* populate exactly the first last_zzi zigzag slots (some zero) */
      for (i = 0; i < last_zzi && i < 64; i++) {
        int v = (int)(rng() % 16201) - 8100;
        if (i > 0 && (rng() & 3) == 0) v = 0;
        x[OC_FZIG_ZAG[i]] = (ogg_int16_t)v;
      }
      /* ensure coefficient at last_zzi-1 nonzero so last_zzi is honest */
      if (last_zzi <= 64 && x[OC_FZIG_ZAG[last_zzi - 1]] == 0)
        x[OC_FZIG_ZAG[last_zzi - 1]] = 1;
      memcpy(xcopy, x, sizeof(x));
      oc_idct8x8_c(y, x, last_zzi);
      for (i = 0; i < 64; i++) put_i16(f, xcopy[i]);
      put_i32(f, last_zzi);
      for (i = 0; i < 64; i++) put_i16(f, y[i]);
    }
  }
  fclose(f);

  /* fDCT cases: residual inputs in [-255,255] (and a few wider) */
  snprintf(path, sizeof(path), "%s/fdct_cases.bin", dir);
  f = fopen(path, "wb");
  for (c = 0; c < 512; c++) {
    ogg_int16_t x[64], y[64];
    for (i = 0; i < 64; i++) x[i] = (ogg_int16_t)((int)(rng() % 511) - 255);
    oc_enc_fdct8x8_c(y, x);
    for (i = 0; i < 64; i++) put_i16(f, x[i]);
    for (i = 0; i < 64; i++) put_i16(f, y[i]);
  }
  fclose(f);

  fprintf(stderr, "vectors written to %s\n", dir);
  return 0;
}
