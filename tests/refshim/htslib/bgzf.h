/* Stub htslib/bgzf.h — params.h includes it but none of the shim's
 * translation units use any BGZF symbol. */
#ifndef SHIM_HTSLIB_BGZF_H
#define SHIM_HTSLIB_BGZF_H
#endif
