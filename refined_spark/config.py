"""Shared decision-rule constants — single source of truth for the Spark
engine, the pure-Python oracle, and the tests.

Values pinned to the reference where it defines them:
  MAX_CANDIDATES = 30   (/root/reference/src/refined/inference/processor.py:54)
  ED_THRESHOLD   = 0.15 (/root/reference/src/refined/evaluation/evaluation.py:168)
  COREF_CAP      = 0.80 (/root/reference/src/refined/doc_preprocessing/candidate_generator.py:55-92)
  COREF_FLOOR    = 0.05 (same)
The linear feature weights replace the reference's learned ED layer
(/root/reference/src/refined/model_components/entity_disambiguation_layer.py:36-119)
per the north rule (prior + string-sim + embedding cosine).
"""

MAX_CANDIDATES = 30
ED_THRESHOLD = 0.15
COREF_CAP = 0.80
COREF_FLOOR = 0.05

W_PRIOR = 0.4
W_JW = 0.3
W_LEV = 0.1
W_COS = 0.2

# Per-mention context window (C1): the cosine feature embeds the text spans
# whose offset lies within +/- this many positions of the mention's span
# offset (doc coordinate space), NOT the whole document — the distributed
# analog of the reference's per-mention token-window pooling
# (/root/reference/src/refined/model_components/refined_model.py:345-380;
# segment windows in modelling_types.py:137-196). Two mentions in one doc
# therefore get DIFFERENT embedding evidence.
CTX_WINDOW = 100
