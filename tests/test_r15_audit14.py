"""Round-15 twin-formula audit — batch 14 (r18-window pre-insurance).

Literal raw-parquet walks: unpivot metrics, the value-based RANGE
frame, best-keeper cluster election, CDC extraction and its SCD2
materialization, the GPT-2-style pre-tokenizer (re-implemented as a
hand-rolled character scanner — no regex), the five-rule quality
verdict stack, and DSIR affinity weights.
"""

from __future__ import annotations

import hashlib
import math
import re
import unicodedata
from collections import Counter, defaultdict
from fractions import Fraction

import pyarrow.parquet as pq

from datawarehouse1_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"

STOPWORDS = {"the", "a", "of", "and", "to", "in", "is", "on", "for", "with"}


def _rows(name: str, columns=None, sf: str = SF):
    return pq.read_table(f"{sf}/{name}.parquet", columns=columns).to_pylist()


def _run(spark, qname: str, sf: str = SF):
    return registry.QUERIES[qname](spark, sf).collect()


def _cents(x) -> int:
    return round(float(x) * 100)


def _ws_tokens(text: str) -> list[str]:
    return [t for t in re.split(r"\s+", text.lower()) if t]


# ---------------------------------------------------------------------------
# q_unpivot_metrics — the melt by hand
# ---------------------------------------------------------------------------


def test_unpivot_metrics_matches_literal_walk(spark):
    nat = {
        r["c_custkey"]: r["c_nationkey"]
        for r in _rows("customer", ["c_custkey", "c_nationkey"])
    }
    nname = {
        r["n_nationkey"]: r["n_name"]
        for r in _rows("nation", ["n_nationkey", "n_name"])
    }
    agg = defaultdict(lambda: [0, 0, set()])
    for r in _rows("orders", ["o_custkey", "o_totalprice"]):
        cell = agg[nname[nat[r["o_custkey"]]]]
        cell[0] += 1
        cell[1] += _cents(r["o_totalprice"])
        cell[2].add(r["o_custkey"])
    expected = {}
    for n, (cnt, cents, custs) in agg.items():
        expected[(n, "n_orders")] = float(cnt)
        expected[(n, "revenue")] = cents / 100.0
        expected[(n, "n_customers")] = float(len(custs))
    got = {
        (r.n_name, r.metric): r.value for r in _run(spark, "q_unpivot_metrics")
    }
    assert got == expected


# ---------------------------------------------------------------------------
# q_window_range_frame — the value-based frame by hand
# ---------------------------------------------------------------------------


def test_range_frame_matches_literal_walk(spark):
    per_cust = defaultdict(list)
    orders = _rows("orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    for r in orders:
        per_cust[r["o_custkey"]].append(float(r["o_totalprice"]))
    expected = {}
    for r in orders:
        p = float(r["o_totalprice"])
        expected[r.get("o_orderkey")] = sum(
            1 for q in per_cust[r["o_custkey"]] if p - 1000.0 <= q <= p
        )
    got = {
        r.o_orderkey: r.n_within_1000
        for r in _run(spark, "q_window_range_frame")
    }
    assert got == expected


# ---------------------------------------------------------------------------
# q_dedup_clusters_best_keeper — longest-member election by hand
# ---------------------------------------------------------------------------


def test_best_keeper_matches_literal_walk(spark):
    docs = {
        r["doc_id"]: r["text"]
        for r in _rows("documents", ["doc_id", "text"])
        if r["doc_id"] < 40
    }
    base = dict(docs)
    for did, text in docs.items():
        if did % 3 == 0:
            base[did + 10000] = text + " zebra quill oxcart"
            base[did + 20000] = text + " zebra quill oxcart jasper flint"
    sh = {}
    for did, text in base.items():
        toks = [t for t in re.split(r"\s+", text.lower()) if t]
        s = {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}
        if s:
            sh[did] = s
    parent = {i: i for i in sh}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    ids = sorted(sh)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sh[a] & sh[b])
            if inter and Fraction(inter, len(sh[a]) + len(sh[b]) - inter) >= Fraction(1, 10):
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    members = defaultdict(list)
    for i in ids:
        members[find(i)].append(i)
    # only ids that appear in a pair walk into the component table
    in_pairs = {i for i in ids if len(members[find(i)]) > 1}
    expected = {}
    for root, mem in members.items():
        mem_p = [m for m in mem if m in in_pairs]
        if not mem_p:
            continue
        cluster = min(mem_p)
        keeper = min(mem_p, key=lambda m: (-len(base[m]), m))
        for m in mem_p:
            expected[m] = (cluster, len(base[m]), keeper, m == keeper)
    got = {
        r.id: (r.cluster, r.n_chars, r.keeper, r.is_keeper)
        for r in _run(spark, "q_dedup_clusters_best_keeper")
    }
    assert got == expected
    # the policy point: some cluster's keeper is NOT its min id
    assert any(k != c for c, _, k, _ in expected.values())


# ---------------------------------------------------------------------------
# q_cdc_extract_changes + q_scd2_from_cdc — diff + history by hand
# ---------------------------------------------------------------------------


def test_cdc_extract_changes_matches_literal_diff(spark):
    base = {
        r["o_orderkey"]: (r["o_orderstatus"], float(r["o_totalprice"]))
        for r in _rows("orders", ["o_orderkey", "o_orderstatus", "o_totalprice"])
    }
    new = {}
    for k, (st, p) in base.items():
        if k % 7 == 0:
            continue  # deleted
        new[k] = (st, p * 1.10 if k % 7 in (1, 2) else p)
        if k % 7 == 3:
            new[k + 100000000] = ("N", p)
    expected = {}
    for k in set(base) | set(new):
        b, n = base.get(k), new.get(k)
        if b is None:
            expected[k] = (*n, "I")
        elif n is None:
            expected[k] = (*b, "D")
        elif b != n:
            expected[k] = (*n, "U")
    got = {
        r.o_orderkey: (r.o_orderstatus, float(r.o_totalprice), r.op)
        for r in _run(spark, "q_cdc_extract_changes")
    }
    assert got == expected
    assert {v[2] for v in expected.values()} == {"I", "U", "D"}


def test_scd2_from_cdc_matches_literal_versions(spark):
    base = {
        r["o_orderkey"]: (r["o_orderstatus"], float(r["o_totalprice"]))
        for r in _rows("orders", ["o_orderkey", "o_orderstatus", "o_totalprice"])
    }
    changes = defaultdict(list)  # key -> [(seq, st, price, op)]
    for k, (st, p) in base.items():
        m = k % 7
        if m == 0:
            changes[k] += [(1, st, p * 1.05, "U"), (2, st, p, "D")]
        if m in (1, 2):
            changes[k].append((1, st, p * 1.10, "U"))
        if m == 2:
            changes[k].append((2, st, p * 1.20, "U"))
        if m == 3:
            changes[k + 100000000].append((1, "N", p, "I"))
    expected = {}
    for k, evs in changes.items():
        evs.sort()
        for i, (seq, st, p, op) in enumerate(evs):
            nxt = evs[i + 1][0] if i + 1 < len(evs) else None
            if op != "D":
                expected[(k, seq)] = (st, p, nxt, nxt is None)
    got = {
        (r.o_orderkey, r.valid_from_seq): (
            r.o_orderstatus,
            float(r.o_totalprice),
            r.valid_to_seq,
            r.is_current,
        )
        for r in _run(spark, "q_scd2_from_cdc")
    }
    assert got == expected


# ---------------------------------------------------------------------------
# q_text_bpe_token_count — hand-rolled scanner, no regex at all
# ---------------------------------------------------------------------------


def _bpe_ish_scan(text: str) -> int:
    """The GPT-2-style pre-tokenizer as a character scanner: at each
    position try, in alternation order — contraction literals, optional
    space + letter run, optional space + digit run, optional space +
    other-run, whitespace run. \\s is the JAVA class [ \\t\\n\\x0b\\f\\r];
    letters/digits via unicodedata major category L/N."""
    ws = set(" \t\n\x0b\f\r")

    def cat(c):
        return unicodedata.category(c)[0]

    n = len(text)
    i = 0
    count = 0
    contractions = ("'s", "'t", "'re", "'ve", "'m", "'ll", "'d")
    while i < n:
        for lit in contractions:
            if text.startswith(lit, i):
                i += len(lit)
                break
        else:
            j = i
            if text[j] == " ":
                j += 1
            if j < n and cat(text[j]) == "L":
                while j < n and cat(text[j]) == "L":
                    j += 1
                i = j
            elif j < n and cat(text[j]) == "N":
                while j < n and cat(text[j]) == "N":
                    j += 1
                i = j
            elif j < n and text[j] not in ws and cat(text[j]) not in ("L", "N"):
                while (
                    j < n
                    and text[j] not in ws
                    and cat(text[j]) not in ("L", "N")
                ):
                    j += 1
                i = j
            elif text[i] in ws:
                while i < n and text[i] in ws:
                    i += 1
            else:
                i += 1  # unreachable for valid input
                continue
        count += 1
    return count


def test_bpe_token_count_matches_hand_scanner(spark):
    expected = {}
    for r in _rows("documents", ["doc_id", "text"]):
        nb = _bpe_ish_scan(r["text"])
        nw = len(_ws_tokens(r["text"]))
        expected[r["doc_id"]] = (nb, nw, nb / max(nw, 1))
    got = {
        r.doc_id: (r.n_bpeish, r.n_ws, r.bpeish_per_word)
        for r in _run(spark, "q_text_bpe_token_count")
    }
    assert got == expected


# ---------------------------------------------------------------------------
# q_curation_quality_verdict — the five-rule stack by hand
# ---------------------------------------------------------------------------


def test_quality_verdict_matches_literal_walk(spark):
    docs = _rows("documents", ["doc_id", "text"])
    per_doc = {}
    corpus_bigrams: Counter = Counter()
    for r in docs:
        t = _ws_tokens(r["text"])
        bgs = [" ".join(p) for p in zip(t, t[1:])]
        per_doc[r["doc_id"]] = (r["text"], t, bgs)
        corpus_bigrams.update(bgs)
    vocab = {bg for bg, c in corpus_bigrams.items() if c >= 3}
    expected = {}
    for did, (text, t, bgs) in per_doc.items():
        nt = len(t)
        nc = len(text)
        cpt = math.floor(1000000.0 * nc / nt) if nt else None
        stop = (
            math.floor(1000000.0 * sum(1 for x in t if x in STOPWORDS) / nt)
            if nt
            else None
        )
        dup_tok = (
            math.floor(1000000.0 * (1.0 - len(set(t)) / nt)) if nt else None
        )
        nb = len(bgs)
        dup_bg = (
            math.floor(1000000.0 * (1.0 - len(set(bgs)) / nb)) if nb else None
        )
        novelty = (
            math.floor(sum(1 for b in bgs if b not in vocab) * 1000000.0 / nb)
            if nb
            else None
        )
        r_tokens = 10 <= nt <= 100000
        r_shape = cpt is not None and 3000000 <= cpt <= 10000000
        r_lang = stop is not None and stop >= 30000
        r_rep = (dup_tok is not None and dup_tok <= 600000) and (
            dup_bg is None or dup_bg <= 150000
        )
        r_nov = novelty is None or novelty <= 100000
        rules = (r_tokens, r_shape, r_lang, r_rep, r_nov)
        names = ("tokens", "word_shape", "lang", "repetition", "novelty")
        expected[did] = (
            nt,
            cpt,
            stop,
            dup_tok,
            dup_bg,
            novelty,
            *rules,
            5 - sum(rules),
            ",".join(n for n, ok in zip(names, rules) if not ok),
            all(rules),
        )
    got = {
        r.doc_id: (
            r.n_tokens,
            r.chars_per_token_e6,
            r.stop_score_e6,
            r.dup_token_frac_e6,
            r.dup_bigram_frac_e6,
            r.novelty_e6,
            r.rule_tokens,
            r.rule_word_shape,
            r.rule_lang,
            r.rule_repetition,
            r.rule_novelty,
            r.n_rules_failed,
            r.fail_reasons,
            r.keep,
        )
        for r in _run(spark, "q_curation_quality_verdict")
    }
    assert got == expected


# ---------------------------------------------------------------------------
# q_curation_dsir_affinity — 256-feature importance ratios by hand
# ---------------------------------------------------------------------------


def test_dsir_affinity_matches_literal_walk(spark):
    feats_per_doc = defaultdict(list)
    lang_of = {}
    cnt_all: Counter = Counter()
    cnt_tgt: Counter = Counter()
    for r in _rows("documents", ["doc_id", "lang", "text"]):
        toks = _ws_tokens(r["text"])
        lang_of[r["doc_id"]] = r["lang"]
        for t in toks:
            f = int(hashlib.md5(t.encode()).hexdigest()[:2], 16)
            feats_per_doc[r["doc_id"]].append(f)
            cnt_all[f] += 1
            if r["lang"] == "en":
                cnt_tgt[f] += 1
    n_all = sum(cnt_all.values())
    n_tgt = sum(cnt_tgt.values())
    w_e6 = {
        f: ((cnt_tgt[f] + 1) * n_all * 1_000_000)
        // ((cnt_all[f] + 1) * n_tgt)
        for f in cnt_all
    }
    expected = {}
    for did, fs in feats_per_doc.items():
        s = sum(w_e6[f] for f in fs)
        expected[did] = (
            lang_of[did],
            len(fs),
            math.floor(float(s) * 1.0 / len(fs)),
        )
    got = {
        r.doc_id: (r.lang, r.n_tokens, r.affinity_e6)
        for r in _run(spark, "q_curation_dsir_affinity")
    }
    assert got == expected
