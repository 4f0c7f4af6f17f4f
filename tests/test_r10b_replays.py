"""Pure-Python replays for the round-10 second-wave operators — same
rationale as test_r10_replays.py: the Spark query and the DuckDB
oracle share authored hash/shingle logic, so a rule mis-stated
identically on both sides would sail through the dual-engine gate.
Each replay here re-derives everything from the written spec (md5 of
the salt string, first 15 hex digits, affine combine mod MINHASH_P)
with hashlib + plain dicts — no texthash builders, no SQL."""

from __future__ import annotations

import hashlib

import pandas as pd
import pytest

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"

MINHASH_P = 1_073_741_789
BASE_MOD = 1 << 30


def _md5_int(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _positional_shingle_hashes(text: str, n: int) -> tuple[int, list[int]]:
    """(n_tokens, positional n-gram hashes) re-derived from the spec."""
    toks = text.split(" ")
    th = [_md5_int(t) % BASE_MOD for t in toks]
    cs = [_md5_int(f"shingle_c_{k}") % BASE_MOD for k in range(n)]
    ph = [
        sum(c * th[i + k] for k, c in enumerate(cs)) % MINHASH_P
        for i in range(len(th) - n + 1)
    ]
    return len(toks), ph


@pytest.mark.slow
def test_dsir_domain_affinity_matches_replay(spark):
    from end2end_data_pipeline_spark.operators.corpus_ops import (
        DSIR_B,
        DSIR_N,
        DSIR_TARGET_LANG,
        DSIR_TAU,
    )

    got = {
        r["doc_id"]: (
            r["lang"],
            r["n_feats"],
            r["target_hits"],
            r["raw_hits"],
            r["affinity"],
            r["selected"],
        )
        for r in entrymod.queries()["docs_dsir_domain_affinity"](
            spark, SF
        ).collect()
    }

    docs = pd.read_parquet(f"{SF}/documents.parquet")
    feats: dict[int, tuple[str, list[int]]] = {}
    for r in docs.itertuples():
        _, ph = _positional_shingle_hashes(r.text, DSIR_N)
        feats[int(r.doc_id)] = (r.lang, [h % DSIR_B for h in ph])

    rcounts: dict[int, int] = {}
    tcounts: dict[int, int] = {}
    for lang, bs in feats.values():
        for b in bs:
            rcounts[b] = rcounts.get(b, 0) + 1
            if lang == DSIR_TARGET_LANG:
                tcounts[b] = tcounts.get(b, 0) + 1
    raw_total, target_total = sum(rcounts.values()), sum(tcounts.values())

    assert len(got) == len(feats)
    for doc_id, (lang, bs) in feats.items():
        nf = len(bs)
        t_hits = sum(tcounts.get(b, 0) for b in bs)
        r_hits = sum(rcounts[b] for b in bs)
        if nf == 0:
            affinity, selected = None, 0
        else:
            affinity = (float(t_hits + nf) * float(raw_total + DSIR_B)) / (
                float(r_hits + nf) * float(target_total + DSIR_B)
            )
            selected = int(affinity >= DSIR_TAU)
        assert got[doc_id] == (lang, nf, t_hits, r_hits, affinity, selected), (
            doc_id,
            got[doc_id],
        )
    # the selector must actually separate the target domain: the
    # target language's selection rate exceeds every other language's
    rates: dict[str, list[int]] = {}
    for _, (lang, *_rest, sel) in got.items():
        rates.setdefault(lang, []).append(sel)
    mean = {lang: sum(v) / len(v) for lang, v in rates.items()}
    assert all(
        mean[DSIR_TARGET_LANG] > r
        for lang, r in mean.items()
        if lang != DSIR_TARGET_LANG
    ), mean


@pytest.mark.slow
def test_repeated_ngram_coverage_matches_replay(spark):
    from end2end_data_pipeline_spark.operators.dedup import DUPSPAN_N

    got = {
        r["doc_id"]: (
            r["n_tokens"],
            r["n_positions"],
            r["n_dup_ngrams"],
            r["covered_tokens"],
            r["dup_coverage"],
        )
        for r in entrymod.queries()["dedup_repeated_ngram_coverage"](
            spark, SF
        ).collect()
    }

    docs = pd.read_parquet(f"{SF}/documents.parquet")
    per_doc: dict[int, tuple[int, list[int]]] = {
        int(r.doc_id): _positional_shingle_hashes(r.text, DUPSPAN_N)
        for r in docs.itertuples()
    }
    docs_with: dict[int, set[int]] = {}
    for doc_id, (_, ph) in per_doc.items():
        for h in ph:
            docs_with.setdefault(h, set()).add(doc_id)
    dup = {h for h, ds in docs_with.items() if len(ds) >= 2}

    assert len(got) == len(per_doc)
    for doc_id, (n_tokens, ph) in per_doc.items():
        starts = [i for i, h in enumerate(ph) if h in dup]
        covered = set()
        for i in starts:
            covered.update(range(i, i + DUPSPAN_N))
        want = (
            n_tokens,
            len(ph),
            len(starts),
            len(covered),
            len(covered) / n_tokens,
        )
        assert got[doc_id] == want, (doc_id, got[doc_id], want)


@pytest.mark.slow
def test_semdedup_matches_numpy_replay(spark):
    """Third engine for SemDeDup: the whole chain — integer quantize,
    4 Lloyd's rounds with the shifted floor division, (dist2, vec_id)
    keep-order, exemplar screen, IEEE cosine — re-derived in
    numpy/plain Python from the written spec."""
    import math

    import numpy as np

    from end2end_data_pipeline_spark.operators.kmeans import (
        ITERS,
        K,
        SEMDEDUP_TAU,
        SEMDEDUP_W,
        SHIFT,
    )

    got = {
        r["vec_id"]: (
            r["cluster"],
            r["keep_rank"],
            r["n_candidates"],
            r["max_cos"],
            r["pruned"],
        )
        for r in entrymod.queries()["semdedup_prune_decisions"](
            spark, SF
        ).collect()
    }

    emb = pd.read_parquet(f"{SF}/embeddings.parquet").sort_values("vec_id")
    ids = emb.vec_id.to_numpy()
    q = np.array(
        [
            np.round(np.asarray(v, dtype=np.float64) * 10_000).astype(
                np.int64
            )
            for v in emb.embedding
        ]
    )
    cent = {int(i): q[ids == i][0].copy() for i in range(K)}

    def assign():
        c = np.stack([cent[i] for i in sorted(cent)])
        d = ((q[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        cid = d.argmin(axis=1)  # ties break to the smaller centroid id
        return cid, d[np.arange(len(q)), cid]

    for _ in range(ITERS):
        cid, _ = assign()
        for c in range(K):
            m = cid == c
            if m.sum():
                s, n = q[m].sum(axis=0), int(m.sum())
                cent[c] = (s + n * SHIFT) // n - SHIFT
    cid, d2 = assign()

    n2 = (q.astype(np.float64) ** 2).sum(axis=1)
    assert len(got) == len(ids)
    for c in range(K):
        idx = np.where(cid == c)[0]
        order = idx[np.lexsort((ids[idx], d2[idx]))]
        ex = order[:SEMDEDUP_W]
        for rank, x in enumerate(order, start=1):
            prev = [
                e
                for e in ex
                if (d2[e], ids[e]) < (d2[x], ids[x])
            ]
            if prev:
                mc = max(
                    float(q[x] @ q[e])
                    / (math.sqrt(n2[x]) * math.sqrt(n2[e]))
                    for e in prev
                )
            else:
                mc = None
            want = (
                c,
                rank,
                len(prev),
                mc,
                int(mc is not None and mc >= SEMDEDUP_TAU),
            )
            assert got[int(ids[x])] == want, (int(ids[x]), got[int(ids[x])], want)


@pytest.mark.slow
def test_split_leakage_audit_matches_replay(spark):
    """Replays the leakage census: split labels re-derived from the
    spec (md5('split:'||doc_id) % 100 against the 80/10 cutpoints),
    pair labeling and the per-combination census in plain Python.
    The pair layer itself (signatures, banding, caps, verification)
    is covered by the dedup suite's own golden tests — this replay
    feeds on the engine's verified pair list by design."""
    from end2end_data_pipeline_spark.operators.sampling import (
        SPLIT_TRAIN_PCT,
        SPLIT_VAL_PCT,
    )

    got = {
        (r["split_lo"], r["split_hi"]): (
            r["n_pairs"],
            r["n_docs_involved"],
            r["max_jaccard"],
        )
        for r in entrymod.queries()["split_leakage_neardup_audit"](
            spark, SF
        ).collect()
    }

    def split_of(doc_id: int) -> str:
        pct = _md5_int(f"split:{doc_id}") % 100
        if pct < SPLIT_TRAIN_PCT:
            return "train"
        if pct < SPLIT_TRAIN_PCT + SPLIT_VAL_PCT:
            return "val"
        return "test"

    pairs = entrymod.queries()["dedup_minhash_pairs"](spark, SF).collect()
    assert pairs, "fixture must produce near-dup pairs for the census"
    census: dict[tuple[str, str], list] = {}
    for r in pairs:
        sa, sb = split_of(r["doc_a"]), split_of(r["doc_b"])
        key = (min(sa, sb), max(sa, sb))
        cell = census.setdefault(key, [0, set(), None])
        cell[0] += 1
        cell[1].update((r["doc_a"], r["doc_b"]))
        cell[2] = (
            r["jaccard"] if cell[2] is None else max(cell[2], r["jaccard"])
        )
    want = {
        k: (n, len(docs), mj) for k, (n, docs, mj) in census.items()
    }
    assert got == want


@pytest.mark.slow
def test_curation_funnel_matches_replay(spark):
    """Replays the five-stage funnel end to end in plain Python:
    quality gate (token count + stopword ratio), exact-dedup
    survivorship (min doc_id per md5(text)), train-split membership,
    shingle-overlap decontamination, and DSIR selection — every rule
    re-derived from the spec, not from the engine builders."""
    from end2end_data_pipeline_spark.operators.corpus_ops import (
        CONTAM_MIN_SHARED,
        CONTAM_N,
        DSIR_B,
        DSIR_N,
        DSIR_TARGET_LANG,
        DSIR_TAU,
        EVAL_MOD,
    )
    from end2end_data_pipeline_spark.operators.text_analysis import (
        MAX_STOP_RATIO,
        MIN_TOKENS_OK,
        STOPWORDS,
    )

    got = {
        r["source"]: (
            r["n_docs"],
            r["n_quality"],
            r["n_unique"],
            r["n_train"],
            r["n_clean"],
            r["n_selected"],
            r["kept_chars"],
        )
        for r in entrymod.queries()["corpus_curation_funnel"](
            spark, SF
        ).collect()
    }

    docs = pd.read_parquet(f"{SF}/documents.parquet")

    # exact-dedup survivors AMONG QUALITY SURVIVORS (the funnel's
    # survivorship convention): keep_id = min doc_id where q = 1
    def qflag(text: str) -> int:
        toks = text.split(" ")
        n_stop = sum(1 for t in toks if t in STOPWORDS)
        return int(
            len(toks) >= MIN_TOKENS_OK
            and n_stop / len(toks) <= MAX_STOP_RATIO
        )

    keep_id: dict[str, int] = {}
    for r in docs.itertuples():
        if not qflag(r.text):
            continue
        h = hashlib.md5(r.text.encode()).hexdigest()
        keep_id[h] = min(keep_id.get(h, int(r.doc_id)), int(r.doc_id))

    # contamination: distinct 4-gram shingle hashes, eval inventory
    def shingle_set(text: str) -> set[int]:
        n_toks, ph = _positional_shingle_hashes(text, CONTAM_N)
        return set(ph) if n_toks >= CONTAM_N else set()

    eval_inventory: set[int] = set()
    for r in docs.itertuples():
        if int(r.doc_id) % EVAL_MOD == 0:
            eval_inventory |= shingle_set(r.text)

    # DSIR bucket tables
    rcounts: dict[int, int] = {}
    tcounts: dict[int, int] = {}
    doc_buckets: dict[int, list[int]] = {}
    for r in docs.itertuples():
        _, ph = _positional_shingle_hashes(r.text, DSIR_N)
        bs = [h % DSIR_B for h in ph]
        doc_buckets[int(r.doc_id)] = bs
        for b in bs:
            rcounts[b] = rcounts.get(b, 0) + 1
            if r.lang == DSIR_TARGET_LANG:
                tcounts[b] = tcounts.get(b, 0) + 1
    raw_total, target_total = sum(rcounts.values()), sum(tcounts.values())

    want: dict[str, list[int]] = {}
    for r in docs.itertuples():
        doc_id = int(r.doc_id)
        q = qflag(r.text)
        u = int(
            keep_id.get(hashlib.md5(r.text.encode()).hexdigest()) == doc_id
        )
        tr = int(doc_id % EVAL_MOD != 0)
        n_shared = len(shingle_set(r.text) & eval_inventory) if tr else 0
        cl = int(n_shared < CONTAM_MIN_SHARED)
        bs = doc_buckets[doc_id]
        if bs:
            nf = len(bs)
            t_hits = sum(tcounts.get(b, 0) for b in bs)
            r_hits = sum(rcounts[b] for b in bs)
            aff = (float(t_hits + nf) * float(raw_total + DSIR_B)) / (
                float(r_hits + nf) * float(target_total + DSIR_B)
            )
            sel = int(aff >= DSIR_TAU)
        else:
            sel = 0
        cell = want.setdefault(r.source, [0] * 7)
        cell[0] += 1
        cell[1] += q
        cell[2] += q * u
        cell[3] += q * u * tr
        cell[4] += q * u * tr * cl
        cell[5] += q * u * tr * cl * sel
        cell[6] += q * u * tr * cl * sel * int(r.n_chars)

    assert got == {k: tuple(v) for k, v in want.items()}


@pytest.mark.slow
def test_packing_efficiency_sweep_matches_replay(spark):
    from end2end_data_pipeline_spark.operators.corpus_ops import (
        PACK_SWEEP_LENS,
    )

    got = {
        r["max_len"]: (
            r["n_docs"],
            r["corpus_tokens"],
            r["padded_tokens"],
            r["wasted_tokens"],
            r["efficiency"],
        )
        for r in entrymod.queries()["corpus_packing_efficiency_sweep"](
            spark, SF
        ).collect()
    }

    docs = pd.read_parquet(f"{SF}/documents.parquet")
    lens = [len(t.split(" ")) for t in docs.text]
    want = {}
    for L in PACK_SWEEP_LENS:
        padded = [-(-n // L) * L for n in lens]
        want[L] = (
            len(lens),
            sum(lens),
            sum(padded),
            sum(padded) - sum(lens),
            float(sum(lens)) / float(sum(padded)),
        )
    assert got == want
    assert all(0 < v[4] <= 1 for v in got.values())


@pytest.mark.slow
def test_source_temperature_mix_matches_replay(spark):
    import math

    got = {
        r["source"]: (
            r["n_tokens"],
            r["token_share"],
            r["temp_weight"],
            r["upsample_factor"],
        )
        for r in entrymod.queries()["source_temperature_mix"](
            spark, SF
        ).collect()
    }

    docs = pd.read_parquet(f"{SF}/documents.parquet")
    per_source: dict[str, int] = {}
    for r in docs.itertuples():
        per_source[r.source] = per_source.get(r.source, 0) + len(
            r.text.split(" ")
        )
    total = sum(per_source.values())
    z = 0.0
    for v in sorted(math.sqrt(float(n)) for n in per_source.values()):
        z += v
    want = {}
    for s, n in per_source.items():
        share = n / float(total)
        w = math.sqrt(float(n)) / z
        want[s] = (n, share, w, w / share)
    assert got == want
    # temperature must compress the mix: every weight sits between
    # proportional share and uniform 1/|sources| (inclusive ends only
    # when shares are equal)
    u = 1.0 / len(per_source)
    for s, (_, share, w, _) in want.items():
        lo, hi = min(share, u), max(share, u)
        assert lo - 1e-12 <= w <= hi + 1e-12, (s, share, w, u)


@pytest.mark.slow
def test_span_cut_plan_matches_replay(spark):
    """From-spec interval-merge replay, plus the cross-query
    invariant: tokens_to_cut per doc must equal the coverage
    profile's covered_tokens (the cut spans ARE the covered set)."""
    from end2end_data_pipeline_spark.operators.dedup import DUPSPAN_N

    got = {
        r["doc_id"]: (r["n_spans"], r["tokens_to_cut"], r["longest_span"])
        for r in entrymod.queries()["dedup_span_cut_plan"](
            spark, SF
        ).collect()
    }
    coverage = {
        r["doc_id"]: r["covered_tokens"]
        for r in entrymod.queries()["dedup_repeated_ngram_coverage"](
            spark, SF
        ).collect()
    }

    docs = pd.read_parquet(f"{SF}/documents.parquet")
    per_doc = {
        int(r.doc_id): _positional_shingle_hashes(r.text, DUPSPAN_N)[1]
        for r in docs.itertuples()
    }
    docs_with: dict[int, set[int]] = {}
    for doc_id, ph in per_doc.items():
        for h in ph:
            docs_with.setdefault(h, set()).add(doc_id)
    dup = {h for h, ds in docs_with.items() if len(ds) >= 2}

    want = {}
    for doc_id, ph in per_doc.items():
        starts = [i + 1 for i, h in enumerate(ph) if h in dup]
        if not starts:
            continue
        spans = []
        for pos in starts:
            if spans and pos <= spans[-1][1] + 1:
                spans[-1][1] = max(spans[-1][1], pos + DUPSPAN_N - 1)
            else:
                spans.append([pos, pos + DUPSPAN_N - 1])
        lens = [e - s + 1 for s, e in spans]
        want[doc_id] = (len(spans), sum(lens), max(lens))
    assert got == want
    for doc_id, (_, cut, _) in got.items():
        assert cut == coverage[doc_id], (doc_id, cut, coverage[doc_id])
    assert all(
        coverage[d] == 0 for d in coverage if d not in got
    ), "docs absent from the plan must have zero coverage"


@pytest.mark.slow
def test_curation_stream_replay_equals_batch_funnel(spark):
    """The streaming drain (file stream -> stream-static index joins
    -> memory sink) must reproduce the batch funnel row-for-row."""
    batch = entrymod.queries()["corpus_curation_funnel"](spark, SF).collect()
    stream = entrymod.queries()["curation_stream_replay"](spark, SF).collect()
    assert [tuple(r) for r in stream] == [tuple(r) for r in batch]
    assert len(batch) > 0


@pytest.mark.slow
def test_ldiversity_matches_replay(spark):
    import math

    from end2end_data_pipeline_spark.operators.quality import LDIV_L

    got = {
        r["l"]: (r["n_classes"], r["n_customers"], r["below_l"])
        for r in entrymod.queries()["customer_ldiversity_profile"](
            spark, SF
        ).collect()
    }

    cust = pd.read_parquet(f"{SF}/customer.parquet")
    classes: dict[tuple, tuple[int, set]] = {}
    for r in cust.itertuples():
        key = (r.c_nationkey, r.c_mktsegment)
        n, bands = classes.get(key, (0, set()))
        bands = set(bands)
        bands.add(math.floor(float(r.c_acctbal) / 1000))
        classes[key] = (n + 1, bands)
    want: dict[int, list[int]] = {}
    for n, bands in classes.values():
        cell = want.setdefault(len(bands), [0, 0])
        cell[0] += 1
        cell[1] += n
    assert got == {
        l: (c, n, int(l < LDIV_L)) for l, (c, n) in want.items()
    }


@pytest.mark.slow
def test_codeswitch_profile_matches_replay(spark):
    got = {
        r["doc_id"]: (
            r["lang"],
            r["n_voted"],
            r["n_switches"],
            r["dominant_lang"],
            r["mixedness"],
        )
        for r in entrymod.queries()["docs_codeswitch_profile"](
            spark, SF
        ).collect()
    }

    docs = pd.read_parquet(f"{SF}/documents.parquet")

    def vote(tok: str):
        c = {m: tok.count(m) for m in ("th", "er", "an")}
        if not any(c.values()):
            return None
        if c["th"] >= c["er"] and c["th"] >= c["an"]:
            return "en"
        return "de" if c["er"] >= c["an"] else "es"

    assert len(got) == len(docs)
    n_mixed = 0
    for r in docs.itertuples():
        voted = [v for v in (vote(t) for t in r.text.split(" ")) if v]
        switches = sum(
            1 for a, b in zip(voted, voted[1:]) if a != b
        )
        counts = {
            lang: sum(1 for v in voted if v == lang)
            for lang in ("en", "de", "es")
        }
        if not voted:
            want = (r.lang, 0, 0, None, None)
        else:
            if counts["en"] >= counts["de"] and counts["en"] >= counts["es"]:
                dom = "en"
            elif counts["de"] >= counts["es"]:
                dom = "de"
            else:
                dom = "es"
            mix = 1.0 - max(counts.values()) / float(len(voted))
            want = (r.lang, len(voted), switches, dom, mix)
            n_mixed += mix > 0
        assert got[int(r.doc_id)] == want, (int(r.doc_id), got[int(r.doc_id)], want)
    assert n_mixed > 0, "fixture must exercise the mixed-document path"


@pytest.mark.slow
def test_typo_blocking_eval_matches_replay(spark):
    """From-spec replay of the blocking eval: a plain-Python
    Levenshtein over the size-blocked pair universe, with the
    deterministic per-block hash cap applied from its definition
    (lowest md5('typoblk:' || partkey) parts keep their slots)."""
    import hashlib

    from end2end_data_pipeline_spark.operators.affinity import (
        TYPO_BLOCK_CAP,
        TYPO_MAX_DIST,
    )

    def h60(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(
                        prev[j] + 1,
                        cur[j - 1] + 1,
                        prev[j - 1] + (ca != cb),
                    )
                )
            prev = cur
        return prev[-1]

    row = entrymod.queries()["typo_blocking_recall_eval"](
        spark, SF
    ).collect()[0]

    parts = pd.read_parquet(f"{SF}/part.parquet")[
        ["p_partkey", "p_name", "p_brand", "p_size"]
    ]
    by_size: dict[int, list] = {}
    for r in parts.itertuples():
        by_size.setdefault(int(r.p_size), []).append(r)
    n_relaxed = n_tight = n_true = n_found = n_truth_parts = 0
    for block in by_size.values():
        block = sorted(
            block,
            key=lambda r: (h60(f"typoblk:{int(r.p_partkey)}"), r.p_partkey),
        )[:TYPO_BLOCK_CAP]
        n_truth_parts += len(block)
        block = sorted(block, key=lambda r: r.p_partkey)
        for i in range(len(block)):
            for j in range(i + 1, len(block)):
                a, b = block[i], block[j]
                n_relaxed += 1
                tight = a.p_brand == b.p_brand
                true = lev(a.p_name, b.p_name) <= TYPO_MAX_DIST
                n_tight += tight
                n_true += true
                n_found += tight and true
    assert row["n_parts"] == len(parts)
    assert row["n_truth_parts"] == n_truth_parts
    assert row["n_relaxed_candidates"] == n_relaxed
    assert row["n_tight_candidates"] == n_tight
    assert row["n_true_pairs"] == n_true
    assert row["n_found"] == n_found
    assert n_true > 0, "fixture must contain near-duplicate names"
    assert row["pair_completeness"] == n_found / n_true
    assert row["candidate_reduction"] == 1.0 - n_tight / n_relaxed


@pytest.mark.slow
def test_tcloseness_matches_replay(spark):
    import math

    from end2end_data_pipeline_spark.operators.quality import TCLOSE_T

    got = {
        (r["c_nationkey"], r["c_mktsegment"]): (
            r["class_size"],
            r["n_bands"],
            r["emd"],
            r["above_t"],
        )
        for r in entrymod.queries()["customer_tcloseness_profile"](
            spark, SF
        ).collect()
    }

    cust = pd.read_parquet(f"{SF}/customer.parquet")
    bands = sorted(
        {math.floor(float(b) / 1000) for b in cust.c_acctbal}
    )
    m = len(bands)
    g = {b: 0 for b in bands}
    classes: dict[tuple, dict] = {}
    for r in cust.itertuples():
        b = math.floor(float(r.c_acctbal) / 1000)
        g[b] += 1
        cl = classes.setdefault((r.c_nationkey, r.c_mktsegment), dict())
        cl[b] = cl.get(b, 0) + 1
    total_g = sum(g.values())

    assert len(got) == len(classes)
    for key, cl in classes.items():
        total_c = sum(cl.values())
        cum = 0
        abs_sum = 0
        for b in bands:
            cum += cl.get(b, 0) * total_g - g[b] * total_c
            abs_sum += abs(cum)
        emd = abs_sum / (float(total_c) * total_g * (m - 1))
        assert got[key] == (total_c, m, emd, int(emd > TCLOSE_T)), (
            key,
            got[key],
        )
    assert max(v[2] for v in got.values()) > 0, "EMD must discriminate" 


@pytest.mark.slow
def test_bpe_merge_steps_matches_replay(spark):
    """From-spec replay of iterated BPE training: Counter census over
    char-tuple sequences, greedy index-scan merge — no delimiter
    strings, no engine builders, so it cross-checks both the two-pass
    replace trick and the argmax tie-break."""
    from collections import Counter

    from end2end_data_pipeline_spark.operators.text_analysis import (
        BPE_STEPS,
    )

    got = [
        (
            r["step"],
            r["left_sym"],
            r["right_sym"],
            r["merged"],
            r["n_occurrences"],
        )
        for r in entrymod.queries()["bpe_merge_steps"](spark, SF).collect()
    ]

    docs = pd.read_parquet(f"{SF}/documents.parquet")
    vocab: Counter = Counter()
    for text in docs.text:
        for w in text.split(" "):
            if w and "|" not in w:
                vocab[w] += 1
    seqs = [(tuple(w), f) for w, f in vocab.items()]
    expected = []
    for step in range(1, BPE_STEPS + 1):
        census: Counter = Counter()
        for syms, f in seqs:
            for a, b in zip(syms, syms[1:]):
                census[(a, b)] += f
        if not census:
            break
        (l, r), n = min(census.items(), key=lambda kv: (-kv[1], kv[0]))
        expected.append((step, l, r, l + r, n))
        merged = []
        for syms, f in seqs:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            merged.append((tuple(out), f))
        seqs = merged
    assert len(expected) == BPE_STEPS, "fixture must sustain all rounds"
    assert got == expected


@pytest.mark.slow
def test_bpe_encode_stats_matches_replay(spark):
    """From-spec replay of the tokenizer-eval half: re-train with the
    Counter/index-scan trainer, segment every word, roll up per-lang
    word/char/BPE-token counts and the two ratio columns."""
    from collections import Counter

    from end2end_data_pipeline_spark.operators.text_analysis import (
        BPE_STEPS,
    )

    got = {
        r["lang"]: (
            r["n_words"],
            r["n_chars"],
            r["n_bpe_tokens"],
            r["chars_per_token"],
            r["tokens_per_word"],
        )
        for r in entrymod.queries()["bpe_encode_stats"](spark, SF).collect()
    }

    docs = pd.read_parquet(f"{SF}/documents.parquet")
    vocab: Counter = Counter()
    lang_word: Counter = Counter()
    for r in docs.itertuples():
        for w in r.text.split(" "):
            if w and "|" not in w:
                vocab[w] += 1
                lang_word[(r.lang, w)] += 1

    seqs = {w: tuple(w) for w in vocab}
    for _ in range(BPE_STEPS):
        census: Counter = Counter()
        for w, syms in seqs.items():
            f = vocab[w]
            for a, b in zip(syms, syms[1:]):
                census[(a, b)] += f
        if not census:
            break
        (l, r), _n = min(census.items(), key=lambda kv: (-kv[1], kv[0]))
        for w, syms in seqs.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            seqs[w] = tuple(out)

    agg: dict[str, list[int]] = {}
    for (lang, w), f in lang_word.items():
        cell = agg.setdefault(lang, [0, 0, 0])
        cell[0] += f
        cell[1] += f * len(w)
        cell[2] += f * len(seqs[w])
    want = {
        lang: (nw, nc, nt, nc / nt, nt / nw)
        for lang, (nw, nc, nt) in agg.items()
    }
    assert got == want
