"""Round-13 IVFADC decade (verdict-r12 task 4): the composed production
ANN stack (IVF coarse probe → PQ/ADC scoring → exact shortlist re-rank,
Jégou et al. 2011) measured at 500 K → 5 M vectors — one and two decades
above the registered oracle query (`ann_ivfpq_search`, 2 K vectors,
K=8 first-vector centroids pinned for DuckDB replayability).

At scale the build is parameterized the way a production store sizes it:
coarse and PQ codebooks are trained driver-side on a 100 K-vector SAMPLE
(numpy Lloyd iterations — training on a sample is the standard recipe;
the full corpus is never iterated), the full-corpus cell assignment and
PQ encoding are ONE mapInPandas matmul pass each (the repo's
knn_vectorized_numpy scale path), and serve reuses the engine's ADC join
shape: integer-code equi-join against a broadcast (queries × M × K) LUT,
cell-keyed candidate join, exact re-rank of the shortlist.

Measures per scale: build wall (assign + encode, written to parquet),
probe wall and recall@10 vs exact L2 truth (brute-force matmul) for a
nprobe sweep, plus candidate volumes — the N·nprobe/K cut measured.

Usage: python tools/ivfpq_decade.py [WORK_DIR] [--small]
(--small: 50 K/200 K scales for a quick shakeout)
Writes artifacts/IVFPQ_DECADE_r13.json.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

DIM = 64
M = 8            # PQ subspaces
SUBDIM = DIM // M
PQ_K = 256       # codes per subspace
K_COARSE = 1024  # coarse cells (≈ sqrt(N) at the top scale)
N_QUERIES = 20
TOPK = 10
SHORTLISTS = [100, 1000]  # exact-re-rank depth: the recall knob once the
# IVF cut stops being the loss (at 5 M, ~1 200 same-cluster points per
# query sit inside one coarse cell — ADC at M=8 cannot rank 10 true
# neighbors into a 100-row shortlist from ~3 000 cell-mates)
NPROBES = [1, 4, 16]
SAMPLE = 100_000
SEED = 20260816


def _gen_vectors(out_dir: str, n: int) -> None:
    """Seeded clustered corpus (the trained-embedding regime): 4 096
    cluster centers, sigma 0.35 — same family as tools/ann_decade.py."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(f"{out_dir}/embeddings.parquet", exist_ok=True)
    rng = np.random.default_rng(SEED)
    centers = rng.standard_normal((4096, DIM)).astype(np.float32)
    chunk = 250_000
    part = 0
    for lo in range(0, n, chunk):
        m = min(chunk, n - lo)
        a = rng.integers(0, len(centers), m)
        v = centers[a] + 0.35 * rng.standard_normal((m, DIM)).astype(
            np.float32
        )
        pq.write_table(
            pa.table(
                {
                    "vec_id": pa.array(range(lo, lo + m), pa.int64()),
                    "embedding": pa.array(
                        list(v), pa.list_(pa.float32(), DIM)
                    ).cast(pa.list_(pa.float32())),
                }
            ),
            f"{out_dir}/embeddings.parquet/part-{part:04d}.parquet",
        )
        part += 1


def _lloyd(sample: np.ndarray, k: int, iters: int = 8) -> np.ndarray:
    """numpy Lloyd k-means on the training sample (driver-side; L2)."""
    rng = np.random.default_rng(SEED + k)
    cents = sample[rng.choice(len(sample), k, replace=False)].copy()
    for _ in range(iters):
        # blockwise argmin to bound memory
        assign = np.empty(len(sample), dtype=np.int64)
        for lo in range(0, len(sample), 65536):
            blk = sample[lo : lo + 65536]
            d = (
                (blk**2).sum(1)[:, None]
                - 2 * blk @ cents.T
                + (cents**2).sum(1)[None, :]
            )
            assign[lo : lo + len(blk)] = d.argmin(1)
        for c in range(k):
            mask = assign == c
            if mask.any():
                cents[c] = sample[mask].mean(0)
    return cents


def main() -> None:
    work = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("--") else "/tmp/ivfpq_decade"
    small = "--small" in sys.argv
    scales = [50_000, 200_000] if small else [500_000, 5_000_000]
    os.makedirs(work, exist_ok=True)
    here = os.path.dirname(os.path.abspath(__file__))
    repo = os.path.dirname(here)

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from vat_etl_spark.session import get_spark

    spark = get_spark("ivfpq-decade")
    results: dict[str, dict] = {}

    for n in scales:
        corpus = f"{work}/vec{n}"
        if not os.path.isdir(f"{corpus}/embeddings.parquet"):
            _gen_vectors(corpus, n)
        em = spark.read.parquet(f"{corpus}/embeddings.parquet")

        # --- train on sample (driver-side numpy, the production recipe)
        t0 = time.time()
        srows = (
            em.where(F.pmod(F.xxhash64("vec_id"), F.lit(max(1, n // SAMPLE))) == 0)
            .limit(SAMPLE)
            .collect()
        )
        sample = np.array([r.embedding for r in srows], dtype=np.float32)
        coarse = _lloyd(sample, K_COARSE)
        books = np.stack(
            [
                _lloyd(
                    np.ascontiguousarray(
                        sample[:, s * SUBDIM : (s + 1) * SUBDIM]
                    ),
                    PQ_K,
                )
                for s in range(M)
            ]
        )  # (M, PQ_K, SUBDIM)
        train_wall = round(time.time() - t0, 1)

        # --- build: ONE matmul pass assigns cells and PQ codes together
        t0 = time.time()
        ct = coarse.astype(np.float64)
        bt = books.astype(np.float64)

        def build(it):
            import pandas as pd

            for pdf in it:
                v = np.array(list(pdf["embedding"]), dtype=np.float64)
                d = (
                    (v**2).sum(1)[:, None]
                    - 2 * v @ ct.T
                    + (ct**2).sum(1)[None, :]
                )
                cell = d.argmin(1)
                codes = np.empty((len(v), M), dtype=np.int64)
                for s in range(M):
                    sub = v[:, s * SUBDIM : (s + 1) * SUBDIM]
                    bs = bt[s]
                    ds = (
                        (sub**2).sum(1)[:, None]
                        - 2 * sub @ bs.T
                        + (bs**2).sum(1)[None, :]
                    )
                    codes[:, s] = ds.argmin(1)
                yield pd.DataFrame(
                    {
                        "vec_id": pdf["vec_id"].to_numpy(),
                        "cell": cell,
                        "codes": list(codes),
                    }
                )

        schema = T.StructType(
            [
                T.StructField("vec_id", T.LongType()),
                T.StructField("cell", T.LongType()),
                T.StructField("codes", T.ArrayType(T.LongType())),
            ]
        )
        idx_path = f"{corpus}/ivfpq_idx"
        em.mapInPandas(build, schema=schema).write.mode(
            "overwrite"
        ).partitionBy("cell").parquet(idx_path)
        build_wall = round(time.time() - t0, 1)

        # --- queries + exact truth (brute-force L2 matmul, the audit)
        qrows = em.where(F.col("vec_id") < N_QUERIES).collect()
        qids = np.array([r.vec_id for r in qrows])
        qm = np.array([r.embedding for r in qrows], dtype=np.float64)

        t0 = time.time()

        def exact(it):
            import pandas as pd

            for pdf in it:
                v = np.array(list(pdf["embedding"]), dtype=np.float64)
                ids = pdf["vec_id"].to_numpy()
                d = (
                    (v**2).sum(1)[None, :]
                    - 2 * qm @ v.T
                    + (qm**2).sum(1)[:, None]
                )
                out = []
                for qi in range(len(qids)):
                    row = d[qi]
                    keep = min(TOPK + 1, len(ids))
                    top = np.argpartition(row, keep - 1)[:keep]
                    for j in top:
                        out.append((int(qids[qi]), int(ids[j]), float(row[j])))
                yield pd.DataFrame(out, columns=["qid", "vec_id", "d2"])

        tr_schema = "qid long, vec_id long, d2 double"
        from pyspark.sql import Window as W

        wq = W.partitionBy("qid").orderBy("d2", "vec_id")
        truth_df = (
            em.mapInPandas(exact, schema=tr_schema)
            .where(F.col("vec_id") != F.col("qid"))
            .withColumn("rn", F.row_number().over(wq))
            .where(F.col("rn") <= TOPK)
            .select("qid", "vec_id")
        )
        truth = {
            (r.qid, r.vec_id) for r in truth_df.collect()
        }
        truth_wall = round(time.time() - t0, 1)

        # --- serve sweep: nprobe cells -> ADC via broadcast LUT join ->
        # exact re-rank of the shortlist (the engine's ann_ivfpq_search
        # join shapes, parameterized)
        idx = spark.read.parquet(idx_path)
        codes_long = idx.select(
            "vec_id",
            "cell",
            F.posexplode("codes").alias("s", "code"),
        )
        row = {
            "n": n,
            "train_wall": train_wall,
            "build_wall": build_wall,
            "truth_wall": truth_wall,
            "k_coarse": K_COARSE,
            "pq_m": M,
            "pq_k": PQ_K,
            "shortlists": SHORTLISTS,
            "probes": {},
        }
        # per-query LUTs (numpy; N_QUERIES x M x PQ_K doubles = tiny)
        luts = np.empty((len(qids), M, PQ_K))
        for s in range(M):
            qsub = qm[:, s * SUBDIM : (s + 1) * SUBDIM]
            bs = books[s].astype(np.float64)
            luts[:, s, :] = (
                (qsub**2).sum(1)[:, None]
                - 2 * qsub @ bs.T
                + (bs**2).sum(1)[None, :]
            )
        lut_rows = [
            (int(qids[qi]), int(s), int(c), float(luts[qi, s, c]))
            for qi in range(len(qids))
            for s in range(M)
            for c in range(PQ_K)
        ]
        lut_df = spark.createDataFrame(
            lut_rows, "qid long, s int, code long, d2q double"
        )
        qcell_d = (
            (qm**2).sum(1)[:, None]
            - 2 * qm @ ct.T
            + (ct**2).sum(1)[None, :]
        )
        for nprobe, SHORTLIST in [
            (np_, sl) for np_ in NPROBES for sl in SHORTLISTS
        ]:
            t0 = time.time()
            probe_rows = [
                (int(qids[qi]), int(c))
                for qi in range(len(qids))
                for c in np.argpartition(qcell_d[qi], nprobe)[:nprobe]
            ]
            probes = spark.createDataFrame(probe_rows, "qid long, cell long")
            cand = probes.join(idx, "cell").where(
                F.col("vec_id") != F.col("qid")
            )
            adc = (
                cand.select("qid", "vec_id", F.posexplode("codes").alias("s", "code"))
                .join(F.broadcast(lut_df), ["qid", "s", "code"])
                .groupBy("qid", "vec_id")
                .agg(F.sum("d2q").alias("adc"))
            )
            ws = W.partitionBy("qid").orderBy("adc", "vec_id")
            short = (
                adc.withColumn("rn", F.row_number().over(ws))
                .where(F.col("rn") <= SHORTLIST)
                .select("qid", "vec_id")
            )
            # exact re-rank of the shortlist against true vectors
            rer = (
                short.join(em, "vec_id")
                .join(
                    spark.createDataFrame(
                        [(int(q),) for q in qids], "qid long"
                    ).join(
                        em.select(
                            F.col("vec_id").alias("qid"),
                            F.col("embedding").alias("qemb"),
                        ),
                        "qid",
                    ),
                    "qid",
                )
                .select(
                    "qid",
                    "vec_id",
                    F.aggregate(
                        F.zip_with(
                            F.col("embedding").cast("array<double>"),
                            F.col("qemb").cast("array<double>"),
                            lambda x, y: (x - y) * (x - y),
                        ),
                        F.lit(0.0),
                        lambda a, b: a + b,
                    ).alias("d2"),
                )
            )
            wr = W.partitionBy("qid").orderBy("d2", "vec_id")
            got = {
                (r.qid, r.vec_id)
                for r in rer.withColumn("rn", F.row_number().over(wr))
                .where(F.col("rn") <= TOPK)
                .collect()
            }
            n_cand = cand.count()
            wall = round(time.time() - t0, 1)
            recall = round(len(got & truth) / len(truth), 4)
            row["probes"][f"nprobe_{nprobe}_sl_{SHORTLIST}"] = {
                "probe_wall": wall,
                "recall_at_10": recall,
                "candidates": n_cand,
                "cut_factor": round(n * len(qids) / max(1, n_cand), 1),
            }
            print(f"n={n} nprobe={nprobe} sl={SHORTLIST}: wall={wall}s "
                  f"recall={recall} cands={n_cand}", flush=True)
        results[str(n)] = row

    if len(scales) == 2:
        a, b = (results[str(s)] for s in scales)
        results["exponents"] = {
            "build": round(
                math.log10(b["build_wall"] / a["build_wall"]), 2
            )
            if a["build_wall"] > 0
            else None,
            "probe_nprobe_4_sl_1000": round(
                math.log10(
                    b["probes"]["nprobe_4_sl_1000"]["probe_wall"]
                    / max(0.1, a["probes"]["nprobe_4_sl_1000"]["probe_wall"])
                ),
                2,
            ),
        }
    out = os.path.join(repo, "artifacts", "IVFPQ_DECADE_r13.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1, sort_keys=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
