/* Clean-room minimal stGraph (sonLib API subset used by multipleAligner.c:
 * undirected weighted graph + single-source shortest paths). */
#ifndef ST_GRAPH_H_
#define ST_GRAPH_H_
#include "sonLibTypes.h"
typedef struct _stGraph stGraph;
stGraph *stGraph_construct(int64_t vertexNo);
void stGraph_destruct(stGraph *g);
void stGraph_addEdge(stGraph *g, int64_t v1, int64_t v2, double weight);
double *stGraph_shortestPaths(stGraph *g, int64_t sourceVertex);
#endif
