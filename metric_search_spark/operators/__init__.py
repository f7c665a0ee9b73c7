"""Set-oriented operators: the reference's one-probe-at-a-time tree searches
(/root/reference/details/tree.cpp nn/knn/rnn) re-expressed as DataFrame joins.

- ``joins``    — two-stage exact kNN join and range (rnn) join
- ``tiling``   — quota clustering (tree.cpp:1341-1430) + raster/vector tile assignment
- ``dedupe``   — insert_if-style threshold dedupe, exact/minhash/simhash near-dup
- ``graph``    — BFS neighborhood + connected components (details/graph.cpp)
- ``matrix``   — pairwise distance matrix (details/matrix.cpp)
- ``ann``      — approximate nearest neighbor over embeddings
"""
