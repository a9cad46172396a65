/* Minimal stand-in for lsp-common-lib's endian helpers: this test
 * environment is little-endian x86. */
#ifndef LSP_PLUG_IN_COMMON_ENDIAN_H_
#define LSP_PLUG_IN_COMMON_ENDIAN_H_

#define __IF_LEBE(le, be)   (le)

template <class T>
inline T CPU_TO_BE(T v) { return v; }   /* only round-tripped in tests */
template <class T>
inline T BE_TO_CPU(T v) { return v; }
template <class T>
inline T CPU_TO_LE(T v) { return v; }
template <class T>
inline T LE_TO_CPU(T v) { return v; }

#endif
