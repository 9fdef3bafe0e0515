"""Contract tests for the seeded fuzzy-corpus generator
(tools/gen_fuzzy_corpus.py) — the instrument behind every decade table
in SCALE.md. Two properties keep those tables trustworthy:

1. DETERMINISM / BYTE-IDENTITY: same (n, seed) → byte-identical parquet,
   with or without the round-11 planted-twin sidecar. The sidecar was
   added with the explicit promise that corpus bytes do not change (so
   decade walls stay comparable across rounds); this pins that promise
   against future generator edits.
2. SIDECAR TRUTH: twins.parquet must describe exactly the near-dup
   structure the corpus contains — every sidecar pair is a genuine
   high-overlap pair, and the production banded MinHash query recovers
   the pairs whose exact shingle-Jaccard clears its 0.6 contract (the
   basis of the 5 M-doc recall receipt, artifacts/TWIN_RECALL_r11_5M).
"""

from __future__ import annotations

import hashlib
import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent


def _gen(out: pathlib.Path, n: int = 3000, seed: int = 7) -> pathlib.Path:
    subprocess.run(
        [
            sys.executable,
            str(REPO / "tools" / "gen_fuzzy_corpus.py"),
            str(out),
            str(n),
            str(seed),
        ],
        check=True,
        capture_output=True,
    )
    return out


def _hashes(d: pathlib.Path) -> list[str]:
    return [
        hashlib.sha256(p.read_bytes()).hexdigest()
        for p in sorted((d / "documents.parquet").glob("*.parquet"))
    ]


def _shingles(text: str) -> set[str]:
    ws = text.split()
    return {" ".join(ws[i : i + 3]) for i in range(len(ws) - 2)}


def test_generator_deterministic_and_sidecar_consistent(tmp_path):
    a = _gen(tmp_path / "a")
    b = _gen(tmp_path / "b")
    assert _hashes(a) == _hashes(b) and len(_hashes(a)) > 0

    import pyarrow.parquet as pq

    twins = pq.read_table(a / "twins.parquet").to_pydict()
    docs = pq.read_table(a / "documents.parquet").to_pydict()
    text = dict(zip(docs["doc_id"], docs["text"]))
    n_docs = len(text)
    pairs = list(zip(twins["doc_a"], twins["doc_b"]))
    assert len(pairs) > 0
    # structural contract: doc_a is a base doc, doc_b its planted twin,
    # twin ids occupy the tail of the id range, each base used once
    n_base = min(twins["doc_b"])
    assert all(da < n_base <= db < n_docs for da, db in pairs)
    assert len(set(twins["doc_a"])) == len(pairs)
    # content contract: planted pairs are genuine high-overlap pairs
    # (token-substitution at edit_rate 0.1 → token-level overlap ~0.8;
    # shingle-level J straddles 0.6, which is WHY per-pair truth matters)
    js = []
    for da, db in pairs:
        sa, sb = _shingles(text[da]), _shingles(text[db])
        js.append(len(sa & sb) / len(sa | sb))
    assert all(j > 0.3 for j in js), min(js)
    assert sum(1 for j in js if j >= 0.6) > 0


def test_banded_minhash_recovers_sidecar_truth(spark, tmp_path):
    """End-to-end twin-recall harness contract at test scale: the
    production banded query must recover ≥ 0.9 of the sidecar pairs
    whose EXACT shingle-Jaccard ≥ 0.6 (the 5 M measurement's shape,
    tools/twin_recall_5m.py, shrunk to 3 000 docs)."""
    import pyarrow.parquet as pq

    from vat_etl_spark.queries import QUERIES

    out = _gen(tmp_path / "c")
    twins = pq.read_table(out / "twins.parquet").to_pydict()
    docs = pq.read_table(out / "documents.parquet").to_pydict()
    text = dict(zip(docs["doc_id"], docs["text"]))
    truth = set()
    for da, db in zip(twins["doc_a"], twins["doc_b"]):
        sa, sb = _shingles(text[da]), _shingles(text[db])
        if len(sa & sb) / len(sa | sb) >= 0.6:
            truth.add((da, db))
    assert truth
    detected = {
        (r.doc_a, r.doc_b)
        for r in QUERIES["dedup_minhash_banded"](spark, str(out)).collect()
    }
    # precision side: anything extra must be a genuine ≥0.6 pair too
    for da, db in detected - truth:
        sa, sb = _shingles(text[da]), _shingles(text[db])
        assert len(sa & sb) / len(sa | sb) >= 0.6, (da, db)
    recall = len(detected & truth) / len(truth)
    assert recall >= 0.9, (recall, len(truth), len(detected))
