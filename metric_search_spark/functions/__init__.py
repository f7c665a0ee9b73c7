"""Spark column expressions + vectorized Arrow kernels.

- ``spatial``   — Morton/quadkey cell math as pure Column expressions (whole-stage
                  codegen; no UDF) mirroring :mod:`metric_search_spark.cells`
- ``vector``    — array<double> vector math as Column expressions (dot, norms,
                  L2/L1/cosine) for SQL-expressible metric paths
- ``text``      — text analysis (token stats, quality score, fingerprints,
                  shingles/minhash, simhash, language id)
- ``image``     — image payload plumbing (decode/stats/resize over mapInPandas)
"""
