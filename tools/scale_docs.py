"""Documents-at-scale measured run (the text leg of verdict item #2:
the sf1.0 image run proved the image pipelines; this proves the text
dedup/analysis pipelines at 1M docs, 200x the bench-scale corpus).

The corpus is synthesized deterministically (per-doc seeds, so any doc
regenerates identically in any shard layout) with the skew a web-scale
text pipeline actually sees:

- a HOT TEMPLATE cluster: 1% of docs are byte-identical boilerplate
  (10k members at 1M docs) — the case that blows member-quadratic LSH
  candidate emission (BENCH/BASELINE.md lesson 15; the distinct-content
  contraction is what makes this run finish);
- exact-duplicate pairs (i % 211 == 210 duplicates doc i-1);
- near-duplicate pairs (i % 97 == 96 mutates one word of doc i-1);
- the rest: 40-80 words drawn from a 2,000-word synthetic vocabulary.

Usage:
    python tools/scale_docs.py [out_dir] [--n 1000000]            # generate
    python tools/scale_docs.py [out_dir] --run [--queries a,b,c]  # measure

Owns its Ray session (like bench.py); not imported by __ray_entry__.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SEED = 0xD0C5
SHARD = 50_000
VOCAB_N = 2_000

TEMPLATE = ("subscribe to our newsletter for updates terms of service "
            "privacy policy all rights reserved contact us about careers "
            "copyright notice cookie settings sitemap help center faq "
            "returns shipping account login register search trending now "
            "related articles most popular editor picks advertisement "
            "sponsored content follow us on social media share this page")


def _vocab() -> np.ndarray:
    import hashlib
    words = []
    for i in range(VOCAB_N):
        h = int.from_bytes(hashlib.sha256(f"v{i}".encode()).digest()[:8],
                           "big")
        words.append(np.base_repr(h % 36 ** 7, 36).lower())
    return np.asarray(words, dtype=object)


_VOC = _vocab()


def _raw(j: int) -> str:
    rng = np.random.default_rng(SEED + j)
    n = int(rng.integers(40, 81))
    return " ".join(_VOC[rng.integers(0, VOCAB_N, size=n)])


def doc_text(i: int) -> str:
    if i % 100 == 17:                       # hot identical template
        return TEMPLATE
    if i % 211 == 210:                      # exact duplicate of i-1's raw
        return _raw(i - 1)
    if i % 97 == 96:                        # near-dup: one word mutated
        toks = _raw(i - 1).split()
        rng = np.random.default_rng(SEED ^ i)
        toks[int(rng.integers(0, len(toks)))] = str(_VOC[int(
            rng.integers(0, VOCAB_N))])
        return " ".join(toks)
    return _raw(i)


_LANGS = ["en", "fr", "de", "es", "pt"]


def _write_shard(out: str, lo: int, hi: int, shard: int) -> int:
    ids = np.arange(lo, hi, dtype=np.int64)
    texts = [doc_text(int(i)) for i in ids]
    tbl = pa.table({
        "doc_id": pa.array(ids),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array([_LANGS[int(i) % len(_LANGS)] for i in ids]),
        "source": pa.array([f"crawl-{int(i) % 7}" for i in ids]),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    pq.write_table(tbl, os.path.join(out, "documents.parquet",
                                     f"part-{shard:05d}.parquet"))
    return tbl.num_rows


def generate(out_dir: str, n: int) -> None:
    docs_dir = os.path.join(out_dir, "documents.parquet")
    marker = os.path.join(out_dir, "_COMPLETE")
    params = f"n={n}"
    if os.path.exists(marker):
        have = open(marker).read().strip()
        if have != params:
            raise ValueError(
                f"{out_dir} was generated with '{have}', requested "
                f"'{params}' — use a fresh out_dir")
        return
    os.makedirs(docs_dir, exist_ok=True)
    ranges = [(lo, min(lo + SHARD, n), s)
              for s, lo in enumerate(range(0, n, SHARD))]
    import ray
    if ray.is_initialized() and n >= 4 * SHARD:
        task = ray.remote(num_cpus=1)(_write_shard)
        total = sum(ray.get([task.remote(out_dir, lo, hi, s)
                             for lo, hi, s in ranges]))
    else:
        total = sum(_write_shard(out_dir, lo, hi, s) for lo, hi, s in ranges)
    with open(marker, "w") as f:
        f.write(params + "\n")


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    out_dir = args[0] if args else "/tmp/stgr_scale/docs1m"
    n = int(sys.argv[sys.argv.index("--n") + 1]) if "--n" in sys.argv \
        else 1_000_000
    only = sys.argv[sys.argv.index("--queries") + 1].split(",") \
        if "--queries" in sys.argv else None
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

    import ray
    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    t0 = time.time()
    generate(out_dir, n)
    gen_s = round(time.time() - t0, 1)
    with open(os.path.join(out_dir, "_COMPLETE")) as f:
        n = int(f.read().strip().split(";")[0].split("=")[1])

    if "--run" not in sys.argv:
        print(json.dumps({"generated": out_dir, "n_docs": n,
                          "gen_sec": gen_s}))
        ray.shutdown()
        return

    from scale_run import PeakTracker, make_timed

    from stac_to_geocore_ray import queries as q

    tracker = PeakTracker()
    tracker.start()
    timings: dict[str, float] = {}
    counts: dict[str, int] = {}
    timed = make_timed(timings, counts, only)

    timed("doc_redact", lambda: q.doc_redact(out_dir))
    timed("doc_prep_pipeline", lambda: q.doc_prep_pipeline(out_dir))
    timed("doc_exact_dedup", lambda: q.doc_exact_dedup(out_dir))
    timed("minhash_neardup", lambda: q.minhash_neardup(out_dir))
    timed("ngram_jaccard_dedup", lambda: q.ngram_jaccard_dedup(out_dir))
    timed("simhash_neardup", lambda: q.simhash_neardup(out_dir))
    timed("doc_quality", lambda: q.doc_quality(out_dir))
    timed("doc_fingerprints", lambda: q.doc_fingerprints(out_dir))
    timed("doc_pack", lambda: q.doc_pack(out_dir))
    timed("doc_chunk", lambda: q.doc_chunk(out_dir))
    timed("doc_word_freq", lambda: q.doc_word_freq(out_dir))
    timed("doc_bigrams", lambda: q.doc_bigrams(out_dir))
    timed("doc_tfidf_topk", lambda: q.doc_tfidf_topk(out_dir))
    timed("doc_dup_ngram_spans", lambda: q.doc_dup_ngram_spans(out_dir))
    timed("doc_repetition", lambda: q.doc_repetition(out_dir))
    timed("doc_contamination", lambda: q.doc_contamination(out_dir))
    timed("minhash_dedup_clusters",
          lambda: q.minhash_dedup_clusters(out_dir))
    tracker.stop()

    print(json.dumps({
        "metric": "docs 200x-scale run",
        "n_docs": n,
        "num_cpus": num_cpus,
        "gen_sec": gen_s,
        "queries": timings,
        "rows": counts,
        "peak_driver_rss_gb": round(tracker.peak_rss_gb, 2),
        "peak_object_store_gb": round(tracker.peak_store_gb, 2),
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
