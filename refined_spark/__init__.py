"""refined_spark — a from-scratch PySpark-native entity-resolution engine.

Re-expresses the capabilities of amazon-science/ReFinED (reference at
/root/reference, studied for *semantics only*) as an idiomatic Spark
DataFrame pipeline:

    blocking (alias-dictionary join + MinHash-LSH)
      -> pairwise scoring (prior + string-sim + embedding cosine)
      -> resolution (argmax + threshold)
      -> transitive clustering (large-star/small-star connected components)

All heavy computation stays JVM-side (built-in pyspark.sql.functions) or in
Arrow-vectorized pandas UDFs; there is no per-row Python anywhere in the hot
path, no driver-side .collect() loops over data, and every stage is a
declarative DataFrame plan that Catalyst/AQE optimizes.
"""

__version__ = "0.1.0"
