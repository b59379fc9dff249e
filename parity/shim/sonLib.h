/* Minimal sonLib API shim (clean-room; only what cPecan-signal's core uses).
 * Semantics follow the sonLib documentation/contract relied upon by the
 * reference sources: stList_sort compares elements (not slots), stIntTuple
 * is a length-prefixed int64 array, stSortedSet orders by the given cmp,
 * stSet is a pointer-identity set. */
#ifndef SONLIB_H_
#define SONLIB_H_

#include <stdarg.h>
#include <stdlib.h>
#include "sonLibTypes.h"

/* ---- memory / error / logging ---- */
void *st_malloc(size_t size);
void *st_calloc(int64_t elements, size_t size);
void st_errAbort(char *format, ...);
void st_errnoAbort(char *format, ...);
void st_logInfo(const char *format, ...);
void st_logDebug(const char *format, ...);
void st_logCritical(const char *format, ...);
void st_uglyf(const char *format, ...);
void st_setLogLevelFromString(const char *string);
int64_t st_system(const char *format, ...);
double st_random(void);
int64_t st_randomInt(int64_t min, int64_t max);

/* ---- exceptions (reduced to abort-with-message) ---- */
void stThrowNew(const char *exceptionId, const char *format, ...);

/* ---- stList ---- */
stList *stList_construct(void);
stList *stList_construct2(int64_t size);
stList *stList_construct3(int64_t size, void (*destructElement)(void *));
void stList_destruct(stList *list);
int64_t stList_length(stList *list);
void *stList_get(stList *list, int64_t index);
void stList_set(stList *list, int64_t index, void *item);
void stList_append(stList *list, void *item);
void stList_appendAll(stList *stListToAddTo, stList *stListToAdd);
void *stList_pop(stList *list);
void *stList_peek(stList *list);
void *stList_remove(stList *list, int64_t index);
void stList_removeItem(stList *list, void *item);
void stList_reverse(stList *list);
void stList_sort(stList *list, int cmpFn(const void *a, const void *b));
void stList_setDestructor(stList *list, void (*destructElement)(void *));
stList *stList_copy(stList *list, void (*destructItem)(void *));
stListIterator *stList_getIterator(stList *list);
void *stList_getNext(stListIterator *iterator);
void stList_destructIterator(stListIterator *iterator);
double *stList_toDoublePtr(stList *list, int64_t *arrayLength);
int64_t *stList_toIntPtr(stList *list, int64_t *arrayLength);
stSortedSet *stList_getSortedSet(stList *list,
                                 int (*cmpFn)(const void *a, const void *b));

/* ---- stIntTuple ---- */
stIntTuple *stIntTuple_construct1(int64_t value);
stIntTuple *stIntTuple_construct2(int64_t value1, int64_t value2);
stIntTuple *stIntTuple_construct3(int64_t v1, int64_t v2, int64_t v3);
stIntTuple *stIntTuple_construct4(int64_t v1, int64_t v2, int64_t v3, int64_t v4);
void stIntTuple_destruct(stIntTuple *intTuple);
int64_t stIntTuple_get(stIntTuple *intTuple, int64_t index);
int64_t stIntTuple_length(stIntTuple *intTuple);
int stIntTuple_cmpFn(stIntTuple *intTuple1, stIntTuple *intTuple2);

/* ---- stSortedSet ---- */
stSortedSet *stSortedSet_construct(void);
stSortedSet *stSortedSet_construct3(int (*compareFn)(const void *, const void *),
                                    void (*destructElementFn)(void *));
void stSortedSet_destruct(stSortedSet *sortedSet);
void stSortedSet_insert(stSortedSet *sortedSet, void *object);
void *stSortedSet_search(stSortedSet *sortedSet, void *object);
void stSortedSet_remove(stSortedSet *sortedSet, void *object);
int64_t stSortedSet_size(stSortedSet *sortedSet);
void *stSortedSet_getLast(stSortedSet *sortedSet);
stSortedSetIterator *stSortedSet_getIterator(stSortedSet *sortedSet);
void *stSortedSet_getNext(stSortedSetIterator *iterator);
void stSortedSet_destructIterator(stSortedSetIterator *iterator);

/* ---- stSortedSet extensions (multipleAligner) ---- */
void *stSortedSet_getFirst(stSortedSet *sortedSet);
void *stSortedSet_getPrevious(stSortedSetIterator *iterator);
void *stSortedSet_searchLessThan(stSortedSet *sortedSet, void *object);
void *stSortedSet_searchGreaterThanOrEqual(stSortedSet *sortedSet, void *object);
void *stSortedSet_searchGreaterThan(stSortedSet *sortedSet, void *object);
void stSortedSet_setDestructor(stSortedSet *sortedSet,
                               void (*destructElement)(void *));
stIntTuple *stIntTuple_construct5(int64_t v1, int64_t v2, int64_t v3,
                                  int64_t v4, int64_t v5);

/* ---- stHash ---- */
stHash *stHash_construct(void);
stHash *stHash_construct2(void (*destructKeys)(void *),
                          void (*destructValues)(void *));
stHash *stHash_construct3(uint64_t (*hashFn)(const void *),
                          int (*eqFn)(const void *, const void *),
                          void (*destructKeys)(void *),
                          void (*destructValues)(void *));
void stHash_destruct(stHash *hash);
void stHash_insert(stHash *hash, void *key, void *value);
void *stHash_search(stHash *hash, void *key);
void *stHash_remove(stHash *hash, void *key);
stHashIterator *stHash_getIterator(stHash *hash);
void *stHash_getNext(stHashIterator *iterator);
void stHash_destructIterator(stHashIterator *iterator);
uint64_t stHash_stringKey(const void *k);
int stHash_stringEqualKey(const void *key1, const void *key2);
void *stHash_removeAndFreeKey(stHash *hash, void *key);
stList *stList_filter2(stList *list, bool (*fn)(void *, void *), void *extra);
void stList_mapReplace(stList *list, void *(*fn)(void *, void *), void *extra);
bool stString_eq(const char *a, const char *b);

/* ---- stSet (pointer-identity set) ---- */
stSet *stSet_construct(void);
stSet *stSet_construct2(void (*destructElement)(void *));
void stSet_destruct(stSet *set);
void stSet_insert(stSet *set, void *object);
void *stSet_search(stSet *set, void *object);
void *stSet_remove(stSet *set, void *object);
int64_t stSet_size(stSet *set);
stSet *stSet_construct3(uint64_t (*hashFn)(const void *),
                        int (*eqFn)(const void *, const void *),
                        void (*destructElement)(void *));
stSetIterator *stSet_getIterator(stSet *set);
void *stSet_getNext(stSetIterator *iterator);
void stSet_destructIterator(stSetIterator *iterator);

/* ---- stString ---- */
char *stString_copy(const char *string);
char *stString_print(const char *format, ...);
stList *stString_split(const char *string);
stList *stString_splitByString(const char *string, const char *delim);
char *stString_getSubString(const char *cA, int64_t start, int64_t length);
char *stString_replace(const char *originalString, const char *toReplace,
                       const char *replacement);
char *stString_reverseComplementString(const char *string);
char stString_reverseComplementChar(char c);
char *stString_join2(const char *pad, stList *strings);

/* ---- stFile ---- */
char *stFile_getLineFromFile(FILE *fileHandle);

#endif
