/* Minimal libogg-compatible header for building the reference libtheora as a
 * test oracle. Implements only the oggpackB MSB-first bit packer API and the
 * ogg_packet struct that libtheora consumes. Written from the public Ogg API
 * documentation; this is a test harness shim, not part of the framework. */
#ifndef _OGG_SHIM_H
#define _OGG_SHIM_H

#include <stddef.h>
#include <stdint.h>
#include <stdlib.h>

#define _ogg_malloc malloc
#define _ogg_calloc calloc
#define _ogg_realloc realloc
#define _ogg_free free

typedef int16_t ogg_int16_t;
typedef uint16_t ogg_uint16_t;
typedef int32_t ogg_int32_t;
typedef uint32_t ogg_uint32_t;
typedef int64_t ogg_int64_t;
typedef uint64_t ogg_uint64_t;

typedef struct {
  long endbyte;
  int endbit;
  unsigned char *buffer;
  unsigned char *ptr;
  long storage;
} oggpack_buffer;

typedef struct {
  unsigned char *packet;
  long bytes;
  long b_o_s;
  long e_o_s;
  ogg_int64_t granulepos;
  ogg_int64_t packetno;
} ogg_packet;

void oggpackB_writeinit(oggpack_buffer *b);
void oggpackB_reset(oggpack_buffer *b);
void oggpackB_writeclear(oggpack_buffer *b);
void oggpackB_write(oggpack_buffer *b, unsigned long value, int bits);
long oggpackB_bytes(oggpack_buffer *b);
unsigned char *oggpackB_get_buffer(oggpack_buffer *b);

/* LSB-first variants (referenced by the legacy api wrapper; unused by our
 * drivers but needed to link if apiwrapper objects are included). */
void oggpack_write(oggpack_buffer *b, unsigned long value, int bits);
void oggpack_writeclear(oggpack_buffer *b);

#endif
