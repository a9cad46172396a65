/* Minimal stand-in: forwards to the system headers (bzero lives in
 * strings.h on glibc). */
#ifndef LSP_PLUG_IN_STDLIB_STRING_H_
#define LSP_PLUG_IN_STDLIB_STRING_H_
#include <string.h>
#include <strings.h>
#endif
