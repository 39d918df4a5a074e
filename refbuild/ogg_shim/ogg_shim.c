/* Minimal MSB-first bit packer implementing the oggpackB API surface that
 * libtheora's encoder uses. Correctness over speed (test oracle only).
 * Verified by round-trip against libtheora's own bit reader (lib/bitpack.c),
 * which reads MSB-first. */
#include <stdlib.h>
#include <string.h>
#include <ogg/ogg.h>

static void oc_shim_grow(oggpack_buffer *b, long need) {
  if (b->endbyte + need + 1 > b->storage) {
    long ns = b->storage * 2 + need + 256;
    unsigned char *nb = (unsigned char *)realloc(b->buffer, ns);
    b->ptr = nb + (b->ptr - b->buffer);
    b->buffer = nb;
    b->storage = ns;
  }
}

void oggpackB_writeinit(oggpack_buffer *b) {
  memset(b, 0, sizeof(*b));
  b->buffer = b->ptr = (unsigned char *)malloc(256);
  b->buffer[0] = 0;
  b->storage = 256;
}

void oggpackB_reset(oggpack_buffer *b) {
  b->endbyte = 0;
  b->endbit = 0;
  b->ptr = b->buffer;
  b->buffer[0] = 0;
}

void oggpackB_writeclear(oggpack_buffer *b) {
  free(b->buffer);
  memset(b, 0, sizeof(*b));
}

void oggpackB_write(oggpack_buffer *b, unsigned long value, int bits) {
  int i;
  if (bits < 32) value &= (bits ? ((1UL << bits) - 1) : 0);
  oc_shim_grow(b, (bits >> 3) + 1);
  for (i = bits - 1; i >= 0; i--) {
    int bit = (int)((value >> i) & 1);
    if (b->endbit == 0) b->buffer[b->endbyte] = 0;
    b->buffer[b->endbyte] |= (unsigned char)(bit << (7 - b->endbit));
    if (++b->endbit == 8) {
      b->endbit = 0;
      b->endbyte++;
    }
  }
  b->ptr = b->buffer + b->endbyte;
}

long oggpackB_bytes(oggpack_buffer *b) {
  return b->endbyte + (b->endbit + 7) / 8;
}

unsigned char *oggpackB_get_buffer(oggpack_buffer *b) { return b->buffer; }

void oggpack_write(oggpack_buffer *b, unsigned long value, int bits) {
  /* LSB-first variant; only needed to satisfy the linker for the legacy
   * wrapper objects, which our drivers never call. */
  int i;
  if (bits < 32) value &= (bits ? ((1UL << bits) - 1) : 0);
  oc_shim_grow(b, (bits >> 3) + 1);
  for (i = 0; i < bits; i++) {
    int bit = (int)((value >> i) & 1);
    if (b->endbit == 0) b->buffer[b->endbyte] = 0;
    b->buffer[b->endbyte] |= (unsigned char)(bit << b->endbit);
    if (++b->endbit == 8) {
      b->endbit = 0;
      b->endbyte++;
    }
  }
  b->ptr = b->buffer + b->endbyte;
}

void oggpack_writeclear(oggpack_buffer *b) { oggpackB_writeclear(b); }
