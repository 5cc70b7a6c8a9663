#!/usr/bin/env python
"""Driver-collect lint (VERDICT r10 item 5): the GWIN!/CART!
discipline applied to `.collect()` call sites.

Every `.collect()` in engine code materializes rows on the driver;
at 100 TB that is safe ONLY for bounded model artifacts (offset maps,
centroid seeds, trained vocabularies), never for corpus-sized
relations. This lint inventories every `.collect()` site under
spark_app_twitter_spark/ by (file, enclosing function) and checks it
against the allowlist below, where each entry states the documented
bound. A NEW collect site fails the lint until it is reviewed and
allowlisted with its bound; a stale entry (code removed/renamed) is
reported so the list stays exact.

Run: python tools/lint_collects.py      (exit 1 on unlisted sites)
     python tools/lint_collects.py --inventory   (print sites found)
"""

from __future__ import annotations

import ast
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(ROOT, "spark_app_twitter_spark")

# (relative file, enclosing function) -> documented bound.
# Keep in sync with the "Driver-side collects audited" VERDICT row.
ALLOWED: dict[tuple[str, str], str] = {
    ("functions/ranking.py", "_offsets"):
        "<= nbuckets rows (per-range-partition sums; shuffle-"
        "partition count, corpus-size independent)",
    ("functions/ranking.py", "exact_global_rank"):
        "<= nbuckets rows (per-range-partition counts)",
    ("operators/clustering.py", "_recenter_rows_keyed"):
        "k centroid means per Lloyd round (model artifact)",
    ("operators/clustering.py", "kmeans_centroid_rows"):
        "<= k seed vectors (vec_id < k filter; model artifact)",
    ("operators/clustering.py", "kmeans_fine_centroid_rows"):
        "k1*k2 fine centroids (model artifact)",
    ("operators/pq.py", "pq_codebook_rows"):
        "PQ_M * PQ_K codebook seed rows (vec_id < PQ_K filter; "
        "model artifact)",
    ("operators/similarity.py", "_pca_axes"):
        "dims^2 covariance entries + dims sums (model artifact)",
    ("operators/similarity.py", "embedding_isotropy"):
        "dims^2 covariance entries (spectrum input; model artifact)",
    ("operators/textstats.py", "bloom_bits_words"):
        "<= 2^11 bloom bit-table words (~8 KiB model artifact; "
        "becomes the gate's constant-folded prefilter literal)",
    ("operators/textstats.py", "_estimate_model_bytes"):
        "exactly 1 row (count + mean key width of the vocab-sized "
        "model; sizes the r12 auto broadcast/shuffle join choice)",
    ("operators/textstats.py", "bigram_lm_model"):
        "|bigram vocab| published-LM entries + 1 vocab-size row; "
        "~10 GB vocab ceiling documented, bigram_lm_score("
        "join_mode='shuffle') beyond it",
    ("operators/textstats.py", "langid_profile_rows"):
        "|langs| * PROFILE_TOP_K profile rows (5*20 here; model "
        "artifact — becomes lang_id's constant-folded inline-argmax "
        "scoring literal)",
    ("operators/textstats.py", "bpe_train_merges_frame"):
        "top-1 pair per merge round, <= n_merges total (model "
        "artifact)",
    ("operators/textstats.py", "bpe_train_merges_batched_frame"):
        "top-batch pairs per round, <= n_merges total (model "
        "artifact)",
    ("operators/textstats.py", "bpe_trained_merges"):
        "<= n_merges cached merge rules (model artifact)",
    ("operators/training.py", "train_lang_lr_weights"):
        "|features| logistic-regression weights per round (model "
        "artifact)",
    ("operators/unigram.py", "_seed_vocab"):
        "alphabet-bounded single chars + <= seed-budget candidate "
        "pieces (model artifact)",
    ("operators/unigram.py", "_estep_counts"):
        "<= vocab-budget piece rows per EM round (model artifact)",
    ("streaming/windowed.py", "split"):
        "1 row (max event-time probe per micro-batch)",
}


def _sites() -> list[tuple[str, str, int]]:
    out = []
    for dirpath, _dirs, files in os.walk(PKG):
        for fname in files:
            if not fname.endswith(".py"):
                continue
            full = os.path.join(dirpath, fname)
            rel = os.path.relpath(full, PKG)
            with open(full) as fh:
                tree = ast.parse(fh.read(), filename=rel)
            # map lineno -> innermost enclosing function name
            funcs: list[tuple[int, int, str]] = []

            class V(ast.NodeVisitor):
                def _fn(self, node):
                    funcs.append(
                        (node.lineno, max(
                            getattr(node, "end_lineno", node.lineno),
                            node.lineno,
                        ), node.name)
                    )
                    self.generic_visit(node)

                visit_FunctionDef = _fn
                visit_AsyncFunctionDef = _fn

            V().visit(tree)

            for node in ast.walk(tree):
                if (
                    isinstance(node, ast.Call)
                    and isinstance(node.func, ast.Attribute)
                    and node.func.attr == "collect"
                ):
                    enclosing = "<module>"
                    best = None
                    for lo, hi, name in funcs:
                        if lo <= node.lineno <= hi:
                            if best is None or lo > best[0]:
                                best = (lo, name)
                    if best:
                        enclosing = best[1]
                    out.append((rel, enclosing, node.lineno))
    return sorted(out)


def main() -> int:
    sites = _sites()
    if "--inventory" in sys.argv:
        for rel, fn, line in sites:
            print(f"{rel}:{line} in {fn}()")
        return 0
    found = {(rel, fn) for rel, fn, _ in sites}
    unlisted = sorted(found - set(ALLOWED))
    stale = sorted(set(ALLOWED) - found)
    for rel, fn in unlisted:
        lines = [str(ln) for r, f, ln in sites if (r, f) == (rel, fn)]
        print(
            f"UNLISTED collect: {rel} in {fn}() at line(s) "
            f"{','.join(lines)} — review the bound and allowlist it"
        )
    for rel, fn in stale:
        print(f"stale allowlist entry (no such site): {rel} / {fn}()")
    n = len(sites)
    print(
        f"{n} collect sites, {len(found)} (file,function) keys, "
        f"{len(unlisted)} unlisted, {len(stale)} stale"
    )
    return 1 if unlisted else 0


if __name__ == "__main__":
    raise SystemExit(main())
