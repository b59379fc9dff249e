/* Clean-room implementation of the sonLib subset used by cPecan-signal's
 * core, so the reference can be compiled IN PLACE (from /root/reference)
 * for differential parity testing.  No reference code is copied; this file
 * implements the documented container/string/IO contracts only. */

#include <assert.h>
#include <stdarg.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <ctype.h>

#include "sonLib.h"
#include <math.h>
#include "stGraph.h"
#include "stPosetAlignment.h"
#include "commonC.h"
#include "pairwiseAlignment.h"
#include "bioioC.h"

/* ---- memory / error / logging ---- */

void *st_malloc(size_t size) {
    /* +8 slack: the reference's emissions_vanilla_initializeEmissionsMatrices
     * (stateMachine.c:209-215) allocates `1 + N*sizeof(double)` bytes but
     * memsets `(1+N)*sizeof(double)` — a 7-byte overrun that glibc's
     * size-class rounding hides in the original build.  The shim reproduces
     * that tolerance rather than the crash. */
    void *p = malloc(size + 8);
    if (p == NULL) {
        fprintf(stderr, "st_malloc: out of memory (%zu bytes)\n", size);
        exit(1);
    }
    return p;
}

void *st_calloc(int64_t elements, size_t size) {
    void *p = calloc(elements == 0 ? 1 : elements, size == 0 ? 1 : size);
    if (p == NULL) {
        fprintf(stderr, "st_calloc: out of memory\n");
        exit(1);
    }
    return p;
}

static void vdie(const char *format, va_list ap) {
    vfprintf(stderr, format, ap);
    fprintf(stderr, "\n");
    exit(1);
}

void st_errAbort(char *format, ...) {
    va_list ap;
    va_start(ap, format);
    vdie(format, ap);
}

void st_errnoAbort(char *format, ...) {
    va_list ap;
    va_start(ap, format);
    vdie(format, ap);
}

void stThrowNew(const char *exceptionId, const char *format, ...) {
    va_list ap;
    fprintf(stderr, "exception %s: ", exceptionId);
    va_start(ap, format);
    vdie(format, ap);
}

static int log_enabled = 0;

void st_setLogLevelFromString(const char *string) {
    log_enabled = string != NULL && (strcasecmp(string, "info") == 0 ||
                                     strcasecmp(string, "debug") == 0);
}

#define LOGFN(name) \
    void name(const char *format, ...) { \
        if (log_enabled) { \
            va_list ap; va_start(ap, format); \
            vfprintf(stderr, format, ap); va_end(ap); \
        } \
    }
LOGFN(st_logInfo)
LOGFN(st_logDebug)
LOGFN(st_logCritical)

void st_uglyf(const char *format, ...) {
    va_list ap;
    va_start(ap, format);
    vfprintf(stderr, format, ap);
    va_end(ap);
}

int64_t st_system(const char *format, ...) {
    char buf[65536];
    va_list ap;
    va_start(ap, format);
    vsnprintf(buf, sizeof(buf), format, ap);
    va_end(ap);
    return system(buf);
}

double st_random(void) {
    return drand48();
}

int64_t st_randomInt(int64_t min, int64_t max) {
    return min + (int64_t) (drand48() * (max - min));
}

/* ---- stList ---- */

struct _stList {
    void **items;
    int64_t length;
    int64_t capacity;
    void (*destructElement)(void *);
};

struct _stListIterator {
    stList *list;
    int64_t index;
};

stList *stList_construct3(int64_t size, void (*destructElement)(void *)) {
    stList *l = st_malloc(sizeof(stList));
    l->capacity = size > 4 ? size : 4;
    l->items = st_calloc(l->capacity, sizeof(void *));
    l->length = size;
    l->destructElement = destructElement;
    return l;
}

stList *stList_construct(void) {
    return stList_construct3(0, NULL);
}

stList *stList_construct2(int64_t size) {
    return stList_construct3(size, NULL);
}

void stList_destruct(stList *list) {
    if (list == NULL) {
        return;
    }
    if (list->destructElement != NULL) {
        for (int64_t i = 0; i < list->length; i++) {
            if (list->items[i] != NULL) {
                list->destructElement(list->items[i]);
            }
        }
    }
    free(list->items);
    free(list);
}

int64_t stList_length(stList *list) {
    return list->length;
}

void *stList_get(stList *list, int64_t index) {
    assert(index >= 0 && index < list->length);
    return list->items[index];
}

void stList_set(stList *list, int64_t index, void *item) {
    assert(index >= 0 && index < list->length);
    list->items[index] = item;
}

void stList_append(stList *list, void *item) {
    if (list->length == list->capacity) {
        list->capacity *= 2;
        list->items = realloc(list->items, list->capacity * sizeof(void *));
    }
    list->items[list->length++] = item;
}

void stList_appendAll(stList *stListToAddTo, stList *stListToAdd) {
    for (int64_t i = 0; i < stListToAdd->length; i++) {
        stList_append(stListToAddTo, stListToAdd->items[i]);
    }
}

void *stList_pop(stList *list) {
    assert(list->length > 0);
    return list->items[--list->length];
}

void *stList_peek(stList *list) {
    assert(list->length > 0);
    return list->items[list->length - 1];
}

void *stList_remove(stList *list, int64_t index) {
    void *item = stList_get(list, index);
    memmove(&list->items[index], &list->items[index + 1],
            (list->length - index - 1) * sizeof(void *));
    list->length--;
    return item;
}

void stList_removeItem(stList *list, void *item) {
    for (int64_t i = 0; i < list->length; i++) {
        if (list->items[i] == item) {
            stList_remove(list, i);
            return;
        }
    }
}

void stList_reverse(stList *list) {
    for (int64_t i = 0; i < list->length / 2; i++) {
        void *t = list->items[i];
        list->items[i] = list->items[list->length - 1 - i];
        list->items[list->length - 1 - i] = t;
    }
}

/* stList_sort compares ELEMENTS (sonLib contract), qsort hands us slots */
static int (*sort_cmp)(const void *, const void *);

static int slot_cmp(const void *a, const void *b) {
    return sort_cmp(*(void *const *) a, *(void *const *) b);
}

void stList_sort(stList *list, int cmpFn(const void *a, const void *b)) {
    sort_cmp = cmpFn;
    qsort(list->items, list->length, sizeof(void *), slot_cmp);
}

void stList_setDestructor(stList *list, void (*destructElement)(void *)) {
    list->destructElement = destructElement;
}

stList *stList_copy(stList *list, void (*destructItem)(void *)) {
    stList *l = stList_construct3(0, destructItem);
    stList_appendAll(l, list);
    return l;
}

stListIterator *stList_getIterator(stList *list) {
    stListIterator *it = st_malloc(sizeof(stListIterator));
    it->list = list;
    it->index = 0;
    return it;
}

void *stList_getNext(stListIterator *iterator) {
    return iterator->index < iterator->list->length
           ? iterator->list->items[iterator->index++] : NULL;
}

void stList_destructIterator(stListIterator *iterator) {
    free(iterator);
}

/* stList_toDoublePtr / stList_toIntPtr are provided by the reference's own
 * hdp_math_utils.c (:812-834) when linked for parity; no shim definition. */

/* ---- stIntTuple: length-prefixed int64 array ---- */

static stIntTuple *intTuple_alloc(int64_t length) {
    int64_t *t = st_malloc(sizeof(int64_t) * (length + 1));
    t[0] = length;
    return t;
}

stIntTuple *stIntTuple_construct1(int64_t value) {
    stIntTuple *t = intTuple_alloc(1);
    t[1] = value;
    return t;
}

stIntTuple *stIntTuple_construct2(int64_t value1, int64_t value2) {
    stIntTuple *t = intTuple_alloc(2);
    t[1] = value1;
    t[2] = value2;
    return t;
}

stIntTuple *stIntTuple_construct3(int64_t v1, int64_t v2, int64_t v3) {
    stIntTuple *t = intTuple_alloc(3);
    t[1] = v1;
    t[2] = v2;
    t[3] = v3;
    return t;
}

stIntTuple *stIntTuple_construct4(int64_t v1, int64_t v2, int64_t v3, int64_t v4) {
    stIntTuple *t = intTuple_alloc(4);
    t[1] = v1;
    t[2] = v2;
    t[3] = v3;
    t[4] = v4;
    return t;
}

void stIntTuple_destruct(stIntTuple *intTuple) {
    free(intTuple);
}

int64_t stIntTuple_get(stIntTuple *intTuple, int64_t index) {
    assert(index >= 0 && index < intTuple[0]);
    return intTuple[index + 1];
}

int64_t stIntTuple_length(stIntTuple *intTuple) {
    return intTuple[0];
}

int stIntTuple_cmpFn(stIntTuple *intTuple1, stIntTuple *intTuple2) {
    int64_t n1 = intTuple1[0], n2 = intTuple2[0];
    int64_t n = n1 < n2 ? n1 : n2;
    for (int64_t i = 1; i <= n; i++) {
        if (intTuple1[i] != intTuple2[i]) {
            return intTuple1[i] < intTuple2[i] ? -1 : 1;
        }
    }
    return n1 == n2 ? 0 : (n1 < n2 ? -1 : 1);
}

/* ---- stSortedSet: sorted dynamic array ---- */

struct _stSortedSet {
    void **items;
    int64_t length;
    int64_t capacity;
    int (*cmp)(const void *, const void *);
    void (*destructElement)(void *);
};

struct _stSortedSetIterator {
    stSortedSet *set;
    int64_t cur;       /* current position; -1 = libavl "null" traverser */
};

static int ptr_cmp(const void *a, const void *b) {
    return a < b ? -1 : (a > b ? 1 : 0);
}

stSortedSet *stSortedSet_construct(void) {
    return stSortedSet_construct3(ptr_cmp, NULL);
}

stSortedSet *stSortedSet_construct3(int (*compareFn)(const void *, const void *),
                                    void (*destructElementFn)(void *)) {
    stSortedSet *s = st_malloc(sizeof(stSortedSet));
    s->capacity = 16;
    s->items = st_malloc(s->capacity * sizeof(void *));
    s->length = 0;
    s->cmp = compareFn;
    s->destructElement = destructElementFn;
    return s;
}

void stSortedSet_destruct(stSortedSet *s) {
    if (s == NULL) {
        return;
    }
    if (s->destructElement != NULL) {
        for (int64_t i = 0; i < s->length; i++) {
            s->destructElement(s->items[i]);
        }
    }
    free(s->items);
    free(s);
}

/* lowest index with items[i] >= object */
static int64_t sset_lower(stSortedSet *s, void *object) {
    int64_t lo = 0, hi = s->length;
    while (lo < hi) {
        int64_t mid = (lo + hi) / 2;
        if (s->cmp(s->items[mid], object) < 0) {
            lo = mid + 1;
        } else {
            hi = mid;
        }
    }
    return lo;
}

void stSortedSet_insert(stSortedSet *s, void *object) {
    int64_t i = sset_lower(s, object);
    if (i < s->length && s->cmp(s->items[i], object) == 0) {
        s->items[i] = object;  /* replace, like the red-black original */
        return;
    }
    if (s->length == s->capacity) {
        s->capacity *= 2;
        s->items = realloc(s->items, s->capacity * sizeof(void *));
    }
    memmove(&s->items[i + 1], &s->items[i], (s->length - i) * sizeof(void *));
    s->items[i] = object;
    s->length++;
}

void *stSortedSet_search(stSortedSet *s, void *object) {
    int64_t i = sset_lower(s, object);
    if (i < s->length && s->cmp(s->items[i], object) == 0) {
        return s->items[i];
    }
    return NULL;
}

void stSortedSet_remove(stSortedSet *s, void *object) {
    int64_t i = sset_lower(s, object);
    if (i < s->length && s->cmp(s->items[i], object) == 0) {
        memmove(&s->items[i], &s->items[i + 1],
                (s->length - i - 1) * sizeof(void *));
        s->length--;
    }
}

int64_t stSortedSet_size(stSortedSet *s) {
    return s->length;
}

void *stSortedSet_getLast(stSortedSet *s) {
    return s->length ? s->items[s->length - 1] : NULL;
}

stSortedSetIterator *stSortedSet_getIterator(stSortedSet *s) {
    stSortedSetIterator *it = st_malloc(sizeof(stSortedSetIterator));
    it->set = s;
    it->cur = -1;
    return it;
}

void *stSortedSet_getNext(stSortedSetIterator *it) {
    if (it->cur + 1 >= it->set->length) {
        it->cur = it->set->length;
        return NULL;
    }
    it->cur++;
    return it->set->items[it->cur];
}

void stSortedSet_destructIterator(stSortedSetIterator *it) {
    free(it);
}

stSortedSet *stList_getSortedSet(stList *list,
                                 int (*cmpFn)(const void *, const void *)) {
    stSortedSet *s = stSortedSet_construct3(cmpFn ? cmpFn : ptr_cmp, NULL);
    for (int64_t i = 0; i < list->length; i++) {
        stSortedSet_insert(s, list->items[i]);
    }
    return s;
}

/* ---- stSet: pointer-identity open-addressing hash set ---- */

struct _stSet {
    void **slots;
    int64_t capacity;   /* power of two */
    int64_t size;
    void (*destructElement)(void *);
    uint64_t (*hashFn)(const void *);          /* NULL = pointer identity */
    int (*eqFn)(const void *, const void *);
};

struct _stSetIterator {
    stSet *set;
    int64_t index;
};

stSet *stSet_construct(void) {
    return stSet_construct2(NULL);
}

stSet *stSet_construct2(void (*destructElement)(void *)) {
    stSet *s = st_malloc(sizeof(stSet));
    s->capacity = 64;
    s->slots = st_calloc(s->capacity, sizeof(void *));
    s->size = 0;
    s->hashFn = NULL;
    s->eqFn = NULL;
    s->destructElement = destructElement;
    return s;
}

void stSet_destruct(stSet *s) {
    if (s == NULL) {
        return;
    }
    if (s->destructElement != NULL) {
        for (int64_t i = 0; i < s->capacity; i++) {
            if (s->slots[i] != NULL) {
                s->destructElement(s->slots[i]);
            }
        }
    }
    free(s->slots);
    free(s);
}

static uint64_t ptr_hash(void *p) {
    uint64_t h = (uint64_t) p;
    h ^= h >> 33;
    h *= 0xff51afd7ed558ccdULL;
    h ^= h >> 33;
    return h;
}

static void stSet_grow(stSet *s);

static void **set_slot(stSet *s, void *object) {
    uint64_t h = s->hashFn ? s->hashFn(object) : ptr_hash(object);
    uint64_t i = h & (s->capacity - 1);
    while (s->slots[i] != NULL && s->slots[i] != object
           && !(s->eqFn != NULL && s->eqFn(s->slots[i], object))) {
        i = (i + 1) & (s->capacity - 1);
    }
    return &s->slots[i];
}

void stSet_insert(stSet *s, void *object) {
    if (s->size * 2 >= s->capacity) {
        stSet_grow(s);
    }
    void **slot = set_slot(s, object);
    if (*slot == NULL) {
        *slot = object;
        s->size++;
    }
}

static void stSet_grow(stSet *s) {
    void **old = s->slots;
    int64_t old_cap = s->capacity;
    s->capacity *= 2;
    s->slots = st_calloc(s->capacity, sizeof(void *));
    s->size = 0;
    for (int64_t i = 0; i < old_cap; i++) {
        if (old[i] != NULL) {
            *set_slot(s, old[i]) = old[i];
            s->size++;
        }
    }
    free(old);
}

void *stSet_search(stSet *s, void *object) {
    return *set_slot(s, object);
}

void *stSet_remove(stSet *s, void *object) {
    void **slot = set_slot(s, object);
    if (*slot == NULL) {
        return NULL;
    }
    *slot = NULL;
    s->size--;
    /* re-insert the probe chain after the removed slot */
    uint64_t i = (slot - s->slots + 1) & (s->capacity - 1);
    while (s->slots[i] != NULL) {
        void *obj = s->slots[i];
        s->slots[i] = NULL;
        s->size--;
        stSet_insert(s, obj);
        i = (i + 1) & (s->capacity - 1);
    }
    return object;
}

int64_t stSet_size(stSet *s) {
    return s->size;
}

stSetIterator *stSet_getIterator(stSet *s) {
    stSetIterator *it = st_malloc(sizeof(stSetIterator));
    it->set = s;
    it->index = 0;
    return it;
}

void *stSet_getNext(stSetIterator *it) {
    while (it->index < it->set->capacity) {
        void *v = it->set->slots[it->index++];
        if (v != NULL) {
            return v;
        }
    }
    return NULL;
}

void stSet_destructIterator(stSetIterator *it) {
    free(it);
}

/* ---- stString ---- */

char *stString_copy(const char *string) {
    char *s = st_malloc(strlen(string) + 1);
    strcpy(s, string);
    return s;
}

char *stString_print(const char *format, ...) {
    va_list ap;
    va_start(ap, format);
    int n = vsnprintf(NULL, 0, format, ap);
    va_end(ap);
    char *s = st_malloc(n + 1);
    va_start(ap, format);
    vsnprintf(s, n + 1, format, ap);
    va_end(ap);
    return s;
}

stList *stString_split(const char *string) {
    stList *l = stList_construct3(0, free);
    const char *p = string;
    while (*p) {
        while (*p && isspace((unsigned char) *p)) {
            p++;
        }
        if (!*p) {
            break;
        }
        const char *q = p;
        while (*q && !isspace((unsigned char) *q)) {
            q++;
        }
        char *tok = st_malloc(q - p + 1);
        memcpy(tok, p, q - p);
        tok[q - p] = '\0';
        stList_append(l, tok);
        p = q;
    }
    return l;
}

stList *stString_splitByString(const char *string, const char *delim) {
    stList *l = stList_construct3(0, free);
    size_t dlen = strlen(delim);
    const char *p = string;
    if (dlen == 0) {
        stList_append(l, stString_copy(string));
        return l;
    }
    for (;;) {
        const char *q = strstr(p, delim);
        if (q == NULL) {
            stList_append(l, stString_copy(p));
            break;
        }
        char *tok = st_malloc(q - p + 1);
        memcpy(tok, p, q - p);
        tok[q - p] = '\0';
        stList_append(l, tok);
        p = q + dlen;
    }
    return l;
}

/* Only reachable through the vendored-lastz popen path (getBlastPairs),
 * which the parity driver never takes — anchors are supplied as input. */
char *getTempFile(void) {
    fprintf(stderr, "shim: getTempFile is not supported (lastz path)\n");
    exit(1);
}

void fastaWrite(char *sequence, char *header, FILE *file) {
    (void) sequence; (void) header; (void) file;
    fprintf(stderr, "shim: fastaWrite is not supported (lastz path)\n");
    exit(1);
}

char *stString_getSubString(const char *cA, int64_t start, int64_t length) {
    char *s = st_malloc(length + 1);
    memcpy(s, cA + start, length);
    s[length] = '\0';
    return s;
}

char *stString_replace(const char *originalString, const char *toReplace,
                       const char *replacement) {
    size_t tlen = strlen(toReplace), rlen = strlen(replacement);
    size_t cap = strlen(originalString) * (rlen > tlen ? rlen : 1) / (tlen ? tlen : 1)
                 + strlen(originalString) + 1;
    char *out = st_malloc(cap + 1);
    char *o = out;
    const char *p = originalString;
    while (*p) {
        if (tlen && strncmp(p, toReplace, tlen) == 0) {
            memcpy(o, replacement, rlen);
            o += rlen;
            p += tlen;
        } else {
            *o++ = *p++;
        }
    }
    *o = '\0';
    return out;
}

char stString_reverseComplementChar(char c) {
    switch (c) {
        case 'a': return 't';
        case 'c': return 'g';
        case 'g': return 'c';
        case 't': return 'a';
        case 'A': return 'T';
        case 'C': return 'G';
        case 'G': return 'C';
        case 'T': return 'A';
        default: return c;
    }
}

char *stString_reverseComplementString(const char *string) {
    int64_t n = strlen(string);
    char *s = st_malloc(n + 1);
    for (int64_t i = 0; i < n; i++) {
        s[i] = stString_reverseComplementChar(string[n - 1 - i]);
    }
    s[n] = '\0';
    return s;
}

char *stString_join2(const char *pad, stList *strings) {
    size_t total = 1;
    for (int64_t i = 0; i < stList_length(strings); i++) {
        total += strlen(stList_get(strings, i)) + strlen(pad);
    }
    char *out = st_malloc(total);
    out[0] = '\0';
    for (int64_t i = 0; i < stList_length(strings); i++) {
        if (i) {
            strcat(out, pad);
        }
        strcat(out, stList_get(strings, i));
    }
    return out;
}

/* ---- stFile ---- */

char *stFile_getLineFromFile(FILE *fileHandle) {
    size_t cap = 256, n = 0;
    char *buf = st_malloc(cap);
    int c;
    while ((c = fgetc(fileHandle)) != EOF && c != '\n') {
        if (n + 1 == cap) {
            cap *= 2;
            buf = realloc(buf, cap);
        }
        buf[n++] = (char) c;
    }
    if (n == 0 && c == EOF) {
        free(buf);
        return NULL;
    }
    buf[n] = '\0';
    return buf;
}

/* ---- legacy List ---- */

struct List *constructEmptyList(int64_t length, void (*destructElement)(void *)) {
    struct List *l = st_malloc(sizeof(struct List));
    l->length = length;
    l->maxLength = length > 4 ? length : 4;
    l->list = st_calloc(l->maxLength, sizeof(void *));
    l->destructElement = destructElement;
    return l;
}

void destructList(struct List *list) {
    if (list == NULL) {
        return;
    }
    if (list->destructElement != NULL) {
        for (int64_t i = 0; i < list->length; i++) {
            if (list->list[i] != NULL) {
                list->destructElement(list->list[i]);
            }
        }
    }
    free(list->list);
    free(list);
}

void listAppend(struct List *list, void *item) {
    if (list->length == list->maxLength) {
        list->maxLength *= 2;
        list->list = realloc(list->list, list->maxLength * sizeof(void *));
    }
    list->list[list->length++] = item;
}

/* ---- PairwiseAlignment / exonerate cigar IO ---- */

struct AlignmentOperation *constructAlignmentOperation(int64_t type,
                                                       int64_t length,
                                                       double score) {
    struct AlignmentOperation *op = st_malloc(sizeof(*op));
    op->opType = type;
    op->length = length;
    op->score = score;
    return op;
}

void destructAlignmentOperation(struct AlignmentOperation *op) {
    free(op);
}

struct PairwiseAlignment *constructPairwiseAlignment(
        char *contig1, int64_t start1, int64_t end1, int64_t strand1,
        char *contig2, int64_t start2, int64_t end2, int64_t strand2,
        double score, struct List *operationList) {
    struct PairwiseAlignment *pA = st_malloc(sizeof(*pA));
    pA->contig1 = stString_copy(contig1);
    pA->start1 = start1;
    pA->end1 = end1;
    pA->strand1 = strand1;
    pA->contig2 = stString_copy(contig2);
    pA->start2 = start2;
    pA->end2 = end2;
    pA->strand2 = strand2;
    pA->score = score;
    pA->operationList = operationList;
    return pA;
}

void destructPairwiseAlignment(struct PairwiseAlignment *pA) {
    destructList(pA->operationList);
    free(pA->contig1);
    free(pA->contig2);
    free(pA);
}

void checkPairwiseAlignment(struct PairwiseAlignment *pA) {
    int64_t len1 = 0, len2 = 0;
    for (int64_t i = 0; i < pA->operationList->length; i++) {
        struct AlignmentOperation *op = pA->operationList->list[i];
        if (op->opType != PAIRWISE_INDEL_Y) {
            len1 += op->length;
        }
        if (op->opType != PAIRWISE_INDEL_X) {
            len2 += op->length;
        }
    }
    int64_t span1 = pA->strand1 ? pA->end1 - pA->start1 : pA->start1 - pA->end1;
    int64_t span2 = pA->strand2 ? pA->end2 - pA->start2 : pA->start2 - pA->end2;
    if (span1 != len1 || span2 != len2) {
        st_errAbort("checkPairwiseAlignment: inconsistent coordinates "
                    "(span1 %lld vs ops %lld, span2 %lld vs ops %lld)",
                    (long long) span1, (long long) len1,
                    (long long) span2, (long long) len2);
    }
}

struct PairwiseAlignment *cigarRead(FILE *fileHandle) {
    char *line = stFile_getLineFromFile(fileHandle);
    if (line == NULL) {
        return NULL;
    }
    stList *tok = stString_split(line);
    free(line);
    if (stList_length(tok) < 10 ||
        strcmp(stList_get(tok, 0), "cigar:") != 0) {
        stList_destruct(tok);
        return NULL;
    }
    struct List *ops = constructEmptyList(0,
            (void (*)(void *)) destructAlignmentOperation);
    for (int64_t i = 10; i + 1 < stList_length(tok); i += 2) {
        const char *o = stList_get(tok, i);
        int64_t type = o[0] == 'M' ? PAIRWISE_MATCH :
                       o[0] == 'D' ? PAIRWISE_INDEL_X : PAIRWISE_INDEL_Y;
        listAppend(ops, constructAlignmentOperation(
                type, atoll(stList_get(tok, i + 1)), 0.0));
    }
    struct PairwiseAlignment *pA = constructPairwiseAlignment(
            stList_get(tok, 1), atoll(stList_get(tok, 2)),
            atoll(stList_get(tok, 3)), *(char *) stList_get(tok, 4) == '+',
            stList_get(tok, 5), atoll(stList_get(tok, 6)),
            atoll(stList_get(tok, 7)), *(char *) stList_get(tok, 8) == '+',
            atof(stList_get(tok, 9)), ops);
    stList_destruct(tok);
    return pA;
}

void cigarWrite(FILE *fileHandle, struct PairwiseAlignment *pA,
                int64_t withProbs) {
    (void) withProbs;
    fprintf(fileHandle, "cigar: %s %lld %lld %c %s %lld %lld %c %f",
            pA->contig1, (long long) pA->start1, (long long) pA->end1,
            pA->strand1 ? '+' : '-', pA->contig2, (long long) pA->start2,
            (long long) pA->end2, pA->strand2 ? '+' : '-', pA->score);
    for (int64_t i = 0; i < pA->operationList->length; i++) {
        struct AlignmentOperation *op = pA->operationList->list[i];
        fprintf(fileHandle, " %c %lld",
                op->opType == PAIRWISE_MATCH ? 'M' :
                op->opType == PAIRWISE_INDEL_X ? 'D' : 'I',
                (long long) op->length);
    }
    fprintf(fileHandle, "\n");
}

/* ---- bioioC ---- */

void fastaRead(FILE *fastaFile,
               void (*addSequence)(void *destination, const char *name,
                                   const char *sequence, int64_t length),
               void *destination) {
    char *line;
    char *name = NULL;
    size_t cap = 256, n = 0;
    char *seq = st_malloc(cap);
    seq[0] = '\0';
    while ((line = stFile_getLineFromFile(fastaFile)) != NULL) {
        if (line[0] == '>') {
            if (name != NULL) {
                addSequence(destination, name, seq, (int64_t) n);
                free(name);
            }
            name = stString_copy(line + 1);
            n = 0;
            seq[0] = '\0';
        } else {
            size_t ln = strlen(line);
            while (n + ln + 1 > cap) {
                cap *= 2;
                seq = realloc(seq, cap);
            }
            memcpy(seq + n, line, ln + 1);
            n += ln;
        }
        free(line);
    }
    if (name != NULL) {
        addSequence(destination, name, seq, (int64_t) n);
        free(name);
    }
    free(seq);
}

/* ====================================================================
 * Additions for multipleAligner.c (cPecanRealign parity build): sorted-set
 * extensions, a chained stHash, a hashed stSet variant, stGraph (Dijkstra),
 * and a 2-sequence stPosetAlignment.  Clean-room implementations of the
 * sonLib contracts the reference relies on.
 * ==================================================================== */

void *stSortedSet_getFirst(stSortedSet *s) {
    return s->length ? s->items[0] : NULL;
}

/* libavl traverser semantics: a fresh iterator sits at the "null"
 * position, so getNext starts at the FIRST element and getPrevious at the
 * LAST; thereafter each call steps from the current position. */
void *stSortedSet_getPrevious(stSortedSetIterator *it) {
    stSortedSet *s = it->set;
    if (it->cur == -1) {
        it->cur = s->length;    /* null -> step back from one-past-end */
    }
    if (it->cur == 0) {
        it->cur = -1;
        return NULL;
    }
    it->cur--;
    return s->items[it->cur];
}

void *stSortedSet_searchLessThan(stSortedSet *s, void *object) {
    int64_t i = sset_lower(s, object);
    return i > 0 ? s->items[i - 1] : NULL;
}

void *stSortedSet_searchGreaterThanOrEqual(stSortedSet *s, void *object) {
    int64_t i = sset_lower(s, object);
    return i < s->length ? s->items[i] : NULL;
}

void *stSortedSet_searchGreaterThan(stSortedSet *s, void *object) {
    int64_t i = sset_lower(s, object);
    while (i < s->length && s->cmp(s->items[i], object) == 0) {
        i++;
    }
    return i < s->length ? s->items[i] : NULL;
}

void stSortedSet_setDestructor(stSortedSet *s, void (*destructElement)(void *)) {
    s->destructElement = destructElement;
}

stIntTuple *stIntTuple_construct5(int64_t v1, int64_t v2, int64_t v3,
                                  int64_t v4, int64_t v5) {
    stIntTuple *t = st_malloc(6 * sizeof(int64_t));
    t[0] = 5; t[1] = v1; t[2] = v2; t[3] = v3; t[4] = v4; t[5] = v5;
    return t;
}

/* ---- stHash: chained hash table with custom hash/equals ---- */

typedef struct _stHashEntry {
    void *key;
    void *value;
    struct _stHashEntry *next;
} stHashEntry;

struct _stHash {
    stHashEntry **buckets;
    int64_t n_buckets;
    int64_t size;
    uint64_t (*hashFn)(const void *);
    int (*eqFn)(const void *, const void *);
    void (*destructKey)(void *);
    void (*destructValue)(void *);
};

struct _stHashIterator {
    stHash *h;
    int64_t bucket;
    stHashEntry *entry;
};

static uint64_t hash_ptr(const void *p) {
    uint64_t v = (uint64_t) (size_t) p;
    v ^= v >> 33; v *= 0xff51afd7ed558ccdULL; v ^= v >> 33;
    return v;
}

static int eq_ptr(const void *a, const void *b) {
    return a == b;
}

stHash *stHash_construct3(uint64_t (*hashFn)(const void *),
                          int (*eqFn)(const void *, const void *),
                          void (*destructKeys)(void *),
                          void (*destructValues)(void *)) {
    stHash *h = st_malloc(sizeof(stHash));
    h->n_buckets = 64;
    h->buckets = st_calloc(h->n_buckets, sizeof(stHashEntry *));
    h->size = 0;
    h->hashFn = hashFn ? hashFn : hash_ptr;
    h->eqFn = eqFn ? eqFn : eq_ptr;
    h->destructKey = destructKeys;
    h->destructValue = destructValues;
    return h;
}

stHash *stHash_construct2(void (*destructKeys)(void *),
                          void (*destructValues)(void *)) {
    return stHash_construct3(NULL, NULL, destructKeys, destructValues);
}

stHash *stHash_construct(void) {
    return stHash_construct3(NULL, NULL, NULL, NULL);
}

void stHash_destruct(stHash *h) {
    if (h == NULL) return;
    for (int64_t i = 0; i < h->n_buckets; i++) {
        stHashEntry *e = h->buckets[i];
        while (e != NULL) {
            stHashEntry *n = e->next;
            if (h->destructKey) h->destructKey(e->key);
            if (h->destructValue) h->destructValue(e->value);
            free(e);
            e = n;
        }
    }
    free(h->buckets);
    free(h);
}

static void hash_grow(stHash *h) {
    int64_t nb = h->n_buckets * 4;
    stHashEntry **b2 = st_calloc(nb, sizeof(stHashEntry *));
    for (int64_t i = 0; i < h->n_buckets; i++) {
        stHashEntry *e = h->buckets[i];
        while (e != NULL) {
            stHashEntry *n = e->next;
            uint64_t j = h->hashFn(e->key) % nb;
            e->next = b2[j];
            b2[j] = e;
            e = n;
        }
    }
    free(h->buckets);
    h->buckets = b2;
    h->n_buckets = nb;
}

void stHash_insert(stHash *h, void *key, void *value) {
    uint64_t j = h->hashFn(key) % h->n_buckets;
    for (stHashEntry *e = h->buckets[j]; e != NULL; e = e->next) {
        if (h->eqFn(e->key, key)) {
            e->value = value;
            return;
        }
    }
    if (h->size > 2 * h->n_buckets) {
        hash_grow(h);
        j = h->hashFn(key) % h->n_buckets;
    }
    stHashEntry *e = st_malloc(sizeof(stHashEntry));
    e->key = key; e->value = value; e->next = h->buckets[j];
    h->buckets[j] = e;
    h->size++;
}

void *stHash_search(stHash *h, void *key) {
    uint64_t j = h->hashFn(key) % h->n_buckets;
    for (stHashEntry *e = h->buckets[j]; e != NULL; e = e->next) {
        if (h->eqFn(e->key, key)) return e->value;
    }
    return NULL;
}

void *stHash_remove(stHash *h, void *key) {
    uint64_t j = h->hashFn(key) % h->n_buckets;
    stHashEntry **p = &h->buckets[j];
    while (*p != NULL) {
        if (h->eqFn((*p)->key, key)) {
            stHashEntry *e = *p;
            void *v = e->value;
            *p = e->next;
            free(e);
            h->size--;
            return v;
        }
        p = &(*p)->next;
    }
    return NULL;
}

stHashIterator *stHash_getIterator(stHash *h) {
    stHashIterator *it = st_malloc(sizeof(stHashIterator));
    it->h = h;
    it->bucket = -1;
    it->entry = NULL;
    return it;
}

void *stHash_getNext(stHashIterator *it) {
    if (it->entry != NULL) {
        it->entry = it->entry->next;
    }
    while (it->entry == NULL) {
        it->bucket++;
        if (it->bucket >= it->h->n_buckets) return NULL;
        it->entry = it->h->buckets[it->bucket];
    }
    return it->entry->key;
}

void stHash_destructIterator(stHashIterator *it) {
    free(it);
}

/* ---- hashed stSet variant: custom hash/equals on the open-addressed
 * representation above ---- */

stSet *stSet_construct3(uint64_t (*hashFn)(const void *),
                        int (*eqFn)(const void *, const void *),
                        void (*destructElement)(void *)) {
    stSet *s = stSet_construct2(destructElement);
    s->hashFn = hashFn;
    s->eqFn = eqFn;
    return s;
}

/* ---- stGraph: undirected weighted graph + Dijkstra (the spanning-tree
 * distance machinery of multipleAligner.c:846-887; vertex counts are tiny
 * (#sequences), so O(V^2) suffices) ---- */

typedef struct _stGraphEdgeRec {
    int64_t to;
    double weight;
    struct _stGraphEdgeRec *next;
} stGraphEdgeRec;

struct _stGraph {
    int64_t n;
    stGraphEdgeRec **adj;
};

stGraph *stGraph_construct(int64_t vertexNo) {
    stGraph *g = st_malloc(sizeof(stGraph));
    g->n = vertexNo;
    g->adj = st_calloc(vertexNo, sizeof(stGraphEdgeRec *));
    return g;
}

void stGraph_destruct(stGraph *g) {
    for (int64_t i = 0; i < g->n; i++) {
        stGraphEdgeRec *e = g->adj[i];
        while (e != NULL) {
            stGraphEdgeRec *nx = e->next;
            free(e);
            e = nx;
        }
    }
    free(g->adj);
    free(g);
}

void stGraph_addEdge(stGraph *g, int64_t v1, int64_t v2, double weight) {
    for (int64_t k = 0; k < 2; k++) {
        stGraphEdgeRec *e = st_malloc(sizeof(stGraphEdgeRec));
        e->to = k ? v1 : v2;
        e->weight = weight;
        int64_t from = k ? v2 : v1;
        e->next = g->adj[from];
        g->adj[from] = e;
    }
}

double *stGraph_shortestPaths(stGraph *g, int64_t sourceVertex) {
    double *dist = st_malloc(g->n * sizeof(double));
    char *done = st_calloc(g->n, 1);
    for (int64_t i = 0; i < g->n; i++) {
        dist[i] = INFINITY;
    }
    dist[sourceVertex] = 0.0;
    for (int64_t it = 0; it < g->n; it++) {
        int64_t u = -1;
        for (int64_t i = 0; i < g->n; i++) {
            if (!done[i] && (u < 0 || dist[i] < dist[u])) {
                u = i;
            }
        }
        if (u < 0 || dist[u] == INFINITY) {
            break;
        }
        done[u] = 1;
        for (stGraphEdgeRec *e = g->adj[u]; e != NULL; e = e->next) {
            if (dist[u] + e->weight < dist[e->to]) {
                dist[e->to] = dist[u] + e->weight;
            }
        }
    }
    free(done);
    return dist;
}

/* ---- stPosetAlignment: pairwise-consistency partial order.  Exact for
 * two sequences (the only case the cPecanRealign path exercises: aligned
 * pairs between seqX and seqY must be strictly monotone); for more
 * sequences this checks per-pair monotonicity without transitive closure,
 * which is sufficient for the progressive-MSA callers compiled here. ---- */

typedef struct _stPosetPairList {
    int64_t *xs, *ys;
    int64_t n, cap;
} stPosetPairList;

struct _stPosetAlignment {
    int64_t seqNo;
    stPosetPairList *pairs;   /* seq1 * seqNo + seq2, seq1 < seq2 */
};

stPosetAlignment *stPosetAlignment_construct(int64_t sequenceNumber) {
    stPosetAlignment *p = st_malloc(sizeof(stPosetAlignment));
    p->seqNo = sequenceNumber;
    p->pairs = st_calloc(sequenceNumber * sequenceNumber,
                         sizeof(stPosetPairList));
    return p;
}

void stPosetAlignment_destruct(stPosetAlignment *p) {
    for (int64_t i = 0; i < p->seqNo * p->seqNo; i++) {
        free(p->pairs[i].xs);
        free(p->pairs[i].ys);
    }
    free(p->pairs);
    free(p);
}

int64_t stPosetAlignment_getSequenceNumber(stPosetAlignment *p) {
    return p->seqNo;
}

static stPosetPairList *poset_list(stPosetAlignment *p, int64_t *s1,
                                   int64_t *p1, int64_t *s2, int64_t *p2) {
    if (*s1 > *s2) {
        int64_t t = *s1; *s1 = *s2; *s2 = t;
        t = *p1; *p1 = *p2; *p2 = t;
    }
    return &p->pairs[*s1 * p->seqNo + *s2];
}

bool stPosetAlignment_isPossible(stPosetAlignment *p, int64_t seq1,
                                 int64_t position1, int64_t seq2,
                                 int64_t position2) {
    stPosetPairList *l = poset_list(p, &seq1, &position1, &seq2, &position2);
    for (int64_t i = 0; i < l->n; i++) {
        int64_t dx = l->xs[i] - position1, dy = l->ys[i] - position2;
        if ((dx <= 0 && dy >= 0) || (dx >= 0 && dy <= 0)) {
            if (!(dx == 0 && dy == 0)) {
                return 0;
            }
        }
    }
    return 1;
}

bool stPosetAlignment_add(stPosetAlignment *p, int64_t seq1,
                          int64_t position1, int64_t seq2,
                          int64_t position2) {
    if (!stPosetAlignment_isPossible(p, seq1, position1, seq2, position2)) {
        return 0;
    }
    stPosetPairList *l = poset_list(p, &seq1, &position1, &seq2, &position2);
    if (l->n == l->cap) {
        l->cap = l->cap ? l->cap * 2 : 16;
        l->xs = realloc(l->xs, l->cap * sizeof(int64_t));
        l->ys = realloc(l->ys, l->cap * sizeof(int64_t));
    }
    l->xs[l->n] = position1;
    l->ys[l->n] = position2;
    l->n++;
    return 1;
}

/* string-keyed hashing for stHash (cPecanRealign's sequence map) */
uint64_t stHash_stringKey(const void *k) {
    const char *c = k;
    uint64_t h = 1469598103934665603ULL;
    while (*c) {
        h ^= (uint64_t) (unsigned char) *c++;
        h *= 1099511628211ULL;
    }
    return h;
}

int stHash_stringEqualKey(const void *key1, const void *key2) {
    return strcmp(key1, key2) == 0;
}

/* ---- remaining cPecanRealign deps ---- */

stList *stList_filter2(stList *list, bool (*fn)(void *, void *), void *extra) {
    stList *out = stList_construct();
    for (int64_t i = 0; i < stList_length(list); i++) {
        void *item = stList_get(list, i);
        if (fn(item, extra)) {
            stList_append(out, item);
        }
    }
    return out;
}

void stList_mapReplace(stList *list, void *(*fn)(void *, void *), void *extra) {
    for (int64_t i = 0; i < stList_length(list); i++) {
        stList_set(list, i, fn(stList_get(list, i), extra));
    }
}

void *stHash_removeAndFreeKey(stHash *h, void *key) {
    uint64_t j = h->hashFn(key) % h->n_buckets;
    stHashEntry **p = &h->buckets[j];
    while (*p != NULL) {
        if (h->eqFn((*p)->key, key)) {
            stHashEntry *e = *p;
            void *v = e->value;
            *p = e->next;
            if (e->key != key) {
                free(e->key);
            }
            free(e);
            h->size--;
            return v;
        }
        p = &(*p)->next;
    }
    return NULL;
}

static void fasta_to_fn_adapter(void *destination, const char *name,
                                const char *sequence, int64_t length) {
    void (*f)(const char *, const char *, int64_t) =
        (void (*)(const char *, const char *, int64_t)) destination;
    f(name, sequence, length);
}

void fastaReadToFunction(FILE *fastaFile,
                         void (*addSequence)(const char *, const char *,
                                             int64_t)) {
    fastaRead(fastaFile, fasta_to_fn_adapter, (void *) addSequence);
}

bool stString_eq(const char *a, const char *b) {
    return strcmp(a, b) == 0;
}
