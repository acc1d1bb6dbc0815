"""ANN retrieval over the embeddings table — the IVFADC serving path.

Build the index once (coarse quantizer + PQ codebooks + 2 B/vector codes),
then answer top-k queries three ways and report recall against exact
brute force:

  1. cosine_knn        — exact, O(queries × corpus): the rerank baseline
  2. ivf_search        — probe the nprobe nearest clusters, exact rerank
  3. pq_search_adc     — asymmetric distance over PQ codes (no vector math
                         per candidate; the memory-bounded scan path)

Run: ``python examples/ann_retrieval.py``.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from _common import session
from tamer_spark.operators.pq import ivfadc_search, pq_encode, pq_search_adc, pq_train
from tamer_spark.operators.similarity import cosine_knn, ivf_build, ivf_search

SF_DIR = "/root/testdata/sf0.01"
K = 5

spark = session("ann-retrieval")
emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
queries = emb.filter(F.col("vec_id") < 20)

# ---- index build (once per corpus; later epochs use ivf_append/pq_encode)
assigned, centroids = ivf_build(emb, n_centroids=8, iters=3)
codebooks = pq_train(emb, m=4, k=16, iters=3)
codes = pq_encode(emb, codebooks)  # (vec_id, codes, packed int64) — 2 B/vector

# ---- serve
exact = cosine_knn(emb, queries, k=K).collect()
ivf2 = ivf_search(assigned, centroids, queries, k=K, nprobe=2).collect()
ivf_full = ivf_search(assigned, centroids, queries, k=K, nprobe=8).collect()
adc = pq_search_adc(codes, codebooks, queries, topk=K).collect()
# the production composition: probe clusters, ADC-rank the candidates,
# exact-rerank only a shortlist — raw vectors touched for 50 rows/query
index = assigned.join(codes.select("vec_id", "codes"), "vec_id")
composed = ivfadc_search(
    index, centroids, codebooks, queries, k=K, nprobe=8, shortlist=50
).collect()


def recall(approx_rows):
    want: dict[int, set[int]] = {}
    got: dict[int, set[int]] = {}
    for r in exact:
        want.setdefault(r.query_id, set()).add(r.neighbor_id)
    for r in approx_rows:
        got.setdefault(r.query_id, set()).add(r.neighbor_id)
    hits = sum(len(got.get(q, set()) & n) for q, n in want.items())
    return hits / sum(len(n) for n in want.values())


n_vec = emb.count()
print(f"corpus: {n_vec} vectors; {len({r.query_id for r in exact})} queries, top-{K}")
print(f"ivf_search nprobe=2: recall@{K} = {recall(ivf2):.2f} "
      f"(scans ~{2 / 8:.0%} of the inverted file)")
print(f"ivf_search nprobe=8 (all clusters): recall@{K} = {recall(ivf_full):.2f}")
print(f"pq_search_adc: recall@{K} = {recall(adc):.2f} "
      f"(2 B/vector codes, m lookups per candidate)")
print(f"ivfadc_search (probe + ADC shortlist + exact rerank of 50): "
      f"recall@{K} = {recall(composed):.2f}")

# full probe degenerates to exact brute force — same results, always
assert sorted(map(tuple, ivf_full)) == sorted(map(tuple, exact))
assert recall(ivf2) > 0.3  # partial probe trades recall for touched data
# The synthetic corpus is UNIFORM RANDOM vectors — the worst case for PQ:
# 128x compression keeps only coarse geometry, and random cosine
# neighborhoods have almost none, so ADC recall is modest here (real
# embedding corpora cluster, which is what both IVF and PQ exploit).
# Production composes the two: probe clusters with IVF, rank candidates
# with ADC, rerank the shortlist exactly.
assert recall(adc) > 0.05
assert {r.query_id for r in adc} == {r.query_id for r in exact}
# the exact rerank can only fix ADC mistakes within the shortlist
assert recall(composed) >= recall(adc)

# ---- r12: SQ8 — the near-exact 4x tier (1 byte/dim, no training structure
# needed), and the honest eval battery over every tier
from tamer_spark.operators.ann_eval import macro_metrics, ranking_metrics
from tamer_spark.operators.rp import random_projection, rp_signs
from tamer_spark.operators.sq import sq_encode, sq_search, sq_train

bounds = sq_train(emb)             # dim rows of driver state, one bounded agg
sq_codes = sq_encode(emb, bounds)  # map-only; frozen bounds -> epoch appends
sq = sq_search(sq_codes, bounds, queries, topk=K).collect()
print(f"sq8 search (1 B/dim, x255-scale integer recon): recall@{K} = {recall(sq):.2f}")
assert recall(sq) > 0.9  # SQ8 is near-exact even on the uniform-noise corpus

# RP is the PRE-step, not a serving index: distances survive (JL), ranks on
# iid noise do not — compose it before LSH/clustering, rerank exactly after.
signs = rp_signs(out_dim=16, dim=64, seed=42)
proj = random_projection(emb, signs)  # map-only under frozen signs

# the graded IR battery: per-query integer-exact metrics + macro means
truth = cosine_knn(emb, queries, k=K).select("query_id", "neighbor_id")
sq_run = sq_search(sq_codes, bounds, queries, topk=K).select(
    "query_id", "neighbor_id", "rank"
)
per_q = ranking_metrics(sq_run, truth, k=K)
mac = macro_metrics(per_q).collect()[0]
print(
    f"eval battery over sq8: n_queries={mac.n_queries} "
    f"recall_ppm={mac.recall_ppm} mrr_ppm={mac.mrr_ppm} "
    f"precision_ppm={mac.precision_ppm}"
)
assert mac.n_queries == 20 and mac.recall_ppm > 900_000
