/* Minimal sonLib type declarations for building the reference's core in
 * place (differential parity harness).  Original-API-compatible clean-room
 * shim — implements only the subset the cPecan-signal sources call
 * (see parity/shim/shim.c). */
#ifndef SONLIB_TYPES_H_
#define SONLIB_TYPES_H_

#include <stdint.h>
#include <stdbool.h>
#include <stdio.h>
#include <string.h>

#ifndef TRUE
#define TRUE 1
#endif
#ifndef FALSE
#define FALSE 0
#endif

typedef struct _stList stList;
typedef struct _stListIterator stListIterator;
typedef struct _stSortedSet stSortedSet;
typedef struct _stSortedSetIterator stSortedSetIterator;
typedef struct _stSet stSet;
typedef struct _stSetIterator stSetIterator;
typedef struct _stHash stHash;
typedef struct _stHashIterator stHashIterator;
typedef struct _stGraph stGraph;
typedef int64_t stIntTuple;

#endif
