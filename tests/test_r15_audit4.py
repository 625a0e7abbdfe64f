"""Round-15 twin-formula audit — batch 4 (VERDICT r14 #5 continuation).

Literal raw-parquet walks closing the r16-window audit inventory:
trigram language profiles, winnowing fingerprints (the full window
min-selection replayed by hand), charset profiles, boilerplate
snippets, k-fold assignment, per-user type Gini, n-gram leakage with
the md5 split rule, and the OOV-rate report.
"""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter, defaultdict

import pyarrow.parquet as pq

from datawarehouse1_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def _rows(name: str, columns=None, sf: str = SF):
    return pq.read_table(f"{sf}/{name}.parquet", columns=columns).to_pylist()


def _run(spark, qname: str, sf: str = SF):
    return registry.QUERIES[qname](spark, sf).collect()


def _ws_tokens(text: str) -> list[str]:
    return [t for t in re.split(r"\s+", text.lower()) if t]


def _word_tokens(text: str) -> list[str]:
    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]


def _md5hex(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


# ---------------------------------------------------------------------------
# q_text_trigram_lang_profile — Cavnar-Trenkle training by hand
# ---------------------------------------------------------------------------


def test_trigram_lang_profile_matches_literal_walk(spark):
    tri_ok = re.compile(r"^[a-z ]{3}$")
    cnt: dict[str, Counter] = defaultdict(Counter)
    for r in _rows("documents", ["lang", "text"]):
        if len(r["text"]) < 3:
            continue
        t = r["text"].lower()
        for i in range(len(t) - 2):
            g = t[i : i + 3]
            if tri_ok.match(g):
                cnt[r["lang"]][g] += 1
    expected = set()
    for lang, c in cnt.items():
        top = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:16]
        for rnk, (g, n) in enumerate(top, 1):
            expected.add((lang, rnk, g, n))
    got = {
        (r.lang, r.rnk, r.trigram, r.n)
        for r in _run(spark, "q_text_trigram_lang_profile")
    }
    assert got == expected


# ---------------------------------------------------------------------------
# q_dedup_winnowing_fingerprint — the window min-selection by hand
# ---------------------------------------------------------------------------


def test_winnowing_fingerprint_matches_literal_walk(spark):
    K, W = 3, 4
    docs = {
        r["doc_id"]: _ws_tokens(r["text"])
        for r in _rows("documents", ["doc_id", "text"])
        if r["doc_id"] < 60
    }
    base = dict(docs)
    for did, toks in docs.items():
        if did % 5 == 0:
            base[did + 30000] = toks[8:28]  # 1-based [9:28]
    fingerprints: dict[int, set] = {}
    for did, toks in base.items():
        grams = [
            " ".join(toks[i : i + K]) for i in range(len(toks) - K + 1)
        ]
        if not grams:
            continue
        n = len(grams)
        hashed = [
            (int(_md5hex(g)[:6], 16), -(j + 1), g)
            for j, g in enumerate(grams)
        ]
        sel = set()
        for p in range(1, max(n - W + 1, 1) + 1):
            window = [
                hashed[j - 1]
                for j in range(p, min(p + W - 1, n) + 1)
            ]
            sel.add(min(window)[2])
        fingerprints[did] = sel
    expected = {}
    ids = sorted(fingerprints)
    for ai, a in enumerate(ids):
        for b in ids[ai + 1 :]:
            shared = len(fingerprints[a] & fingerprints[b])
            if shared >= 3:
                na, nb = len(fingerprints[a]), len(fingerprints[b])
                expected[(a, b)] = (
                    shared,
                    na,
                    nb,
                    shared * 1_000_000 // min(na, nb),
                )
    got = {
        (r.src_doc, r.dst_doc): (r.n_shared, r.n_src_fp, r.n_dst_fp, r.overlap_e6)
        for r in _run(spark, "q_dedup_winnowing_fingerprint")
    }
    assert got == expected
    assert any(dst >= 30000 for _, dst in expected)  # staged excerpts fired


# ---------------------------------------------------------------------------
# q_text_charset_profile — script-class closure by hand
# ---------------------------------------------------------------------------


def test_charset_profile_matches_literal_walk(spark):
    suffix = " 世界汉字 русский мир 12345."
    classes = {
        "alpha": re.compile(r"[A-Za-z]"),
        "digit": re.compile(r"[0-9]"),
        "space": re.compile(r"[ ]"),
        "cjk": re.compile(r"[一-鿿]"),
        "cyr": re.compile(r"[Ѐ-ӿ]"),
    }
    agg: dict[str, Counter] = defaultdict(Counter)
    for r in _rows("documents", ["doc_id", "source", "text"]):
        texts = [r["text"]]
        if r["doc_id"] % 7 == 0:
            texts.append(r["text"] + suffix)
        for t in texts:
            c = agg[r["source"]]
            c["n_docs"] += 1
            c["total"] += len(t)
            for name, rx in classes.items():
                c[name] += len(rx.findall(t))
    expected = {}
    for source, c in agg.items():
        total = c["total"]
        other = total - sum(c[n] for n in classes)
        expected[source] = (
            c["n_docs"],
            total,
            *(c[n] * 1_000_000 // total for n in classes),
            other * 1_000_000 // total,
        )
    got = {
        r.source: (
            r.n_docs,
            r.n_chars,
            r.alpha_e6,
            r.digit_e6,
            r.space_e6,
            r.cjk_e6,
            r.cyr_e6,
            r.other_e6,
        )
        for r in _run(spark, "q_text_charset_profile")
    }
    assert got == expected


# ---------------------------------------------------------------------------
# q_curation_boilerplate_snippets — header/footer windows by hand
# ---------------------------------------------------------------------------


def test_boilerplate_snippets_matches_literal_walk(spark):
    footer = "subscribe to our newsletter today"
    n_src: Counter = Counter()
    freq: Counter = Counter()
    for r in _rows("documents", ["doc_id", "source", "text"]):
        text = (
            r["text"] + " " + footer if r["doc_id"] % 3 == 0 else r["text"]
        )
        n_src[r["source"]] += 1
        tk = _ws_tokens(text)
        if len(tk) >= 10:
            freq[(r["source"], "header", " ".join(tk[:5]))] += 1
            freq[(r["source"], "footer", " ".join(tk[-5:]))] += 1
    expected = {}
    for (source, kind, snippet), n in freq.items():
        share = n * 1_000_000 // n_src[source]
        if n >= 3 and share >= 100_000:
            expected[(source, kind, snippet)] = (n, share)
    got = {
        (r.source, r.kind, r.snippet): (r.n_docs, r.share_e6)
        for r in _run(spark, "q_curation_boilerplate_snippets")
    }
    assert got == expected
    assert any(k == "footer" for _, k, _ in expected)  # staged footer fired


# ---------------------------------------------------------------------------
# q_split_kfold_assign — md5 24-bit fold rule by hand
# ---------------------------------------------------------------------------


def test_kfold_assign_matches_literal_walk(spark):
    cells: dict[tuple[int, str], list[int]] = defaultdict(lambda: [0, 0])
    lang_tot: Counter = Counter()
    for r in _rows("documents", ["doc_id", "lang", "n_chars"]):
        fold = int(_md5hex(str(r["doc_id"]))[:6], 16) % 5
        cell = cells[(fold, r["lang"])]
        cell[0] += 1
        cell[1] += r["n_chars"]
        lang_tot[r["lang"]] += 1
    expected = {
        (fold, lang): (n, chars, n * 1_000_000 // lang_tot[lang])
        for (fold, lang), (n, chars) in cells.items()
    }
    got = {
        (r.fold, r.lang): (r.n_docs, r.n_chars, r.share_in_lang_e6)
        for r in _run(spark, "q_split_kfold_assign")
    }
    assert got == expected
    assert {f for f, _ in got} == set(range(5))


# ---------------------------------------------------------------------------
# q_events_user_type_gini — impurity identity by hand
# ---------------------------------------------------------------------------


def test_user_type_gini_matches_literal_walk(spark):
    ut: dict[int, Counter] = defaultdict(Counter)
    for r in _rows("events", ["user_id", "event_type"]):
        ut[r["user_id"]][r["event_type"]] += 1
    expected = {}
    for uid, cnts in ut.items():
        s = sum(cnts.values())
        sq = sum(c * c for c in cnts.values())
        expected[uid] = (s, len(cnts), (s * s - sq) * 1_000_000 // (s * s))
    got = {
        r.user_id: (r.n_events, r.n_types, r.gini_e6)
        for r in _run(spark, "q_events_user_type_gini")
    }
    assert got == expected
    # the closed form really is Gini impurity: cross-check one user
    uid, cnts = next(iter(ut.items()))
    s = sum(cnts.values())
    gini = 1.0 - sum((c / s) ** 2 for c in cnts.values())
    assert abs(expected[uid][2] / 1_000_000 - gini) < 1e-5


# ---------------------------------------------------------------------------
# q_split_ngram_leakage — split rule + window fingerprints by hand
# ---------------------------------------------------------------------------


def test_ngram_leakage_matches_literal_walk(spark):
    def split_of(doc_id: int) -> str:
        prefix = _md5hex(str(doc_id))[:8]
        if prefix < "e6666666":
            return "train"
        if prefix < "f3333333":
            return "val"
        return "test"

    base = []
    for r in _rows("documents", ["doc_id", "text"]):
        base.append((r["doc_id"], r["text"]))
        if r["doc_id"] % 2 == 0:
            base.append((-(r["doc_id"] + 1), r["text"]))
    train_w = set()
    holdout_docs = []
    for did, text in base:
        split = split_of(did)
        toks = _word_tokens(text)
        wins = {
            " ".join(toks[i : i + 10]) for i in range(len(toks) - 9)
        }
        if split == "train":
            train_w |= wins
        else:
            holdout_docs.append((split, wins))
    n_docs: Counter = Counter()
    n_leaked: Counter = Counter()
    for split, wins in holdout_docs:
        n_docs[split] += 1
        if wins & train_w:
            n_leaked[split] += 1
    expected = {
        split: (n, n_leaked[split], n_leaked[split] * 1_000_000 // n)
        for split, n in n_docs.items()
    }
    got = {
        r.split: (r.n_docs, r.n_leaked, r.leak_share_e6)
        for r in _run(spark, "q_split_ngram_leakage")
    }
    assert got == expected
    assert sum(n_leaked.values()) > 0  # staged duplicates fired


# ---------------------------------------------------------------------------
# q_docs_oov_rate — top-1000 vocabulary + tail mass by hand
# ---------------------------------------------------------------------------


def test_oov_rate_matches_literal_walk(spark):
    sw: dict[str, Counter] = defaultdict(Counter)
    for r in _rows("documents", ["source", "text"]):
        sw[r["source"]].update(_ws_tokens(r["text"]))
    tot: Counter = Counter()
    for cnts in sw.values():
        tot.update(cnts)
    vocab = {
        t
        for t, _ in sorted(tot.items(), key=lambda kv: (-kv[1], kv[0]))[:1000]
    }
    expected = {}
    for source, cnts in sw.items():
        n_tokens = sum(cnts.values())
        n_oov = sum(c for t, c in cnts.items() if t not in vocab)
        expected[source] = (n_tokens, n_oov, n_oov * 1_000_000 // n_tokens)
    got = {
        r.source: (r.n_tokens, r.n_oov, r.oov_share_e6)
        for r in _run(spark, "q_docs_oov_rate")
    }
    assert got == expected
