/* Conformance harness for the repo's arithmetic-JPEG implementation.
 *
 * Uses the system libjpeg (libjpeg62-turbo) as the independent
 * reference codec for ITU-T T.81 arithmetic coding:
 *
 *   jpeg_conformance toarith     in.jpg out.jpg   transcode to SOF9
 *   jpeg_conformance toarithprog in.jpg out.jpg   transcode to SOF10
 *   jpeg_conformance decode      in.jpg out.pnm   decode to PGM/PPM
 *
 * Transcoding goes through jpeg_read_coefficients /
 * jpeg_write_coefficients, so the arithmetic output carries EXACTLY
 * the source stream's quantized coefficients — the repo's decoder
 * must therefore decode the transcode bit-identically to the Huffman
 * original.  `decode` renders through libjpeg's own IDCT, so two
 * streams with equal coefficients must produce byte-equal PNM.
 *
 * Built on demand by tests (gcc -O2 jpeg_conformance.c -ljpeg); the
 * committed tests/golden fixtures were generated with it.
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <jpeglib.h>

static void die(const char *msg) {
  fprintf(stderr, "jpeg_conformance: %s\n", msg);
  exit(1);
}

static void transcode(const char *inpath, const char *outpath, int prog) {
  struct jpeg_decompress_struct src;
  struct jpeg_compress_struct dst;
  struct jpeg_error_mgr jsrc, jdst;
  FILE *fin = fopen(inpath, "rb");
  FILE *fout = fopen(outpath, "wb");
  jvirt_barray_ptr *coefs;

  if (!fin || !fout) die("cannot open file");
  src.err = jpeg_std_error(&jsrc);
  jpeg_create_decompress(&src);
  jpeg_stdio_src(&src, fin);
  jpeg_read_header(&src, TRUE);
  coefs = jpeg_read_coefficients(&src);

  dst.err = jpeg_std_error(&jdst);
  jpeg_create_compress(&dst);
  jpeg_stdio_dest(&dst, fout);
  jpeg_copy_critical_parameters(&src, &dst);
  dst.arith_code = TRUE;
  dst.optimize_coding = FALSE;
  if (prog) jpeg_simple_progression(&dst);
  jpeg_write_coefficients(&dst, coefs);
  jpeg_finish_compress(&dst);
  jpeg_destroy_compress(&dst);
  jpeg_finish_decompress(&src);
  jpeg_destroy_decompress(&src);
  fclose(fin);
  fclose(fout);
}

static void decode(const char *inpath, const char *outpath) {
  struct jpeg_decompress_struct cinfo;
  struct jpeg_error_mgr jerr;
  FILE *fin = fopen(inpath, "rb");
  FILE *fout = fopen(outpath, "wb");
  JSAMPARRAY buf;
  int stride;

  if (!fin || !fout) die("cannot open file");
  cinfo.err = jpeg_std_error(&jerr);
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, fin);
  jpeg_read_header(&cinfo, TRUE);
  jpeg_start_decompress(&cinfo);
  stride = cinfo.output_width * cinfo.output_components;
  buf = (*cinfo.mem->alloc_sarray)((j_common_ptr)&cinfo, JPOOL_IMAGE,
                                   stride, 1);
  fprintf(fout, "P%c\n%u %u\n255\n",
          cinfo.output_components == 1 ? '5' : '6',
          cinfo.output_width, cinfo.output_height);
  while (cinfo.output_scanline < cinfo.output_height) {
    jpeg_read_scanlines(&cinfo, buf, 1);
    fwrite(buf[0], 1, stride, fout);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(fin);
  fclose(fout);
}

int main(int argc, char **argv) {
  if (argc != 4) die("usage: toarith|toarithprog|decode in out");
  if (!strcmp(argv[1], "toarith"))
    transcode(argv[2], argv[3], 0);
  else if (!strcmp(argv[1], "toarithprog"))
    transcode(argv[2], argv[3], 1);
  else if (!strcmp(argv[1], "decode"))
    decode(argv[2], argv[3]);
  else
    die("unknown mode");
  return 0;
}
