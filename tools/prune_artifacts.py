"""Artifact-store GC + warm rebuild (VERDICT r8 item #6).

``artifact_plan`` paths embed a code+data fingerprint, so every edit to
the package orphans the previous generation of artifacts — they can
never be loaded again (the path derivation will never produce them),
they just accumulate in the committed ``.artifacts/`` tree. This tool:

  prune   delete, per known sf dir, every stem whose fingerprint isn't
          current, plus ``.build-*`` temp leftovers and stale ``.lock``
          files; tag dirs that map to no known sf dir are reported (and
          removed with --unknown, e.g. after testdata moves).
  rebuild run the minimal set of registry queries that covers every
          artifact_plan call site, per sf dir, so the store is fully
          repopulated under the current fingerprint before committing.

Usage: python tools/prune_artifacts.py [prune|rebuild|both] [--unknown]
Round-close routine: ``python tools/prune_artifacts.py both``.
"""

from __future__ import annotations

import glob
import hashlib
import os
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark_recs.workloads import common as C  # noqa: E402

# Every artifact_plan call site is reachable from one of these.
# KEY_COVERAGE maps each artifact key (the literal in the call site) to
# the registry query that builds it; tests/test_artifacts.py
# cross-checks the map against the call sites found in the source, so
# a new artifact-backed builder without warm coverage fails CI.
KEY_COVERAGE = {
    "holdout_base": "rs24_cf_holdout_eval",
    "holdout_top10": "rs24_cf_holdout_eval",
    "ens_eval_users": "rs30_ensemble_eval",
    "ens_cand_counts": "rs30_ensemble_eval",
    "ens_content_topk": "rs30_ensemble_eval",
    "ens_als_topk": "rs30_ensemble_eval",
    "joint_topk": "rs32_joint_feature_eval",
    "cf_top5": "rs05_item_cooccurrence",
    "brand_basket_counts": "rs15_association_rules",
    "cc_labels_t05": "l21_dedup_components",
    "e2e_neighbors": "rs39_e2e_pipeline",
    "l98_canonical_ids": "l98_corpus_e2e",
}
WARM_QUERIES = (
    "rs24_cf_holdout_eval",
    "rs27_sampled_metrics_bias",  # shares the holdout artifacts
    "rs30_ensemble_eval",
    "rs32_joint_feature_eval",
    "rs05_item_cooccurrence",
    "rs15_association_rules",
    "l21_dedup_components",
    "rs39_e2e_pipeline",
    "l98_corpus_e2e",
)

SF_DIRS = tuple(
    sorted(
        {
            os.path.normpath(os.path.abspath(d))
            for d in glob.glob("/root/testdata/sf*")
            if os.path.isdir(d)
        }
        | (
            {os.path.normpath(os.path.abspath(os.environ["SPARK_GRAFT_SF_DIR"]))}
            if os.environ.get("SPARK_GRAFT_SF_DIR")
            else set()
        )
    )
)


def _tag(norm: str) -> str:
    return (
        os.path.basename(norm) + "-" + hashlib.md5(norm.encode()).hexdigest()[:8]
    )


def prune(remove_unknown: bool = False) -> int:
    root = C.ARTIFACT_ROOT
    if not os.path.isdir(root):
        print("no artifact root; nothing to prune")
        return 0
    known = {_tag(d): d for d in SF_DIRS}
    n_removed = 0
    for tag in sorted(os.listdir(root)):
        tag_path = os.path.join(root, tag)
        if not os.path.isdir(tag_path):
            continue
        sf = known.get(tag)
        if sf is None:
            print(f"UNKNOWN tag {tag} (no matching sf dir)", end="")
            if remove_unknown:
                shutil.rmtree(tag_path)
                n_removed += 1
                print(" — removed")
            else:
                print(" — kept (pass --unknown to remove)")
            continue
        fp = hashlib.md5(
            (C.code_fingerprint() + C.data_fingerprint(sf)).encode()
        ).hexdigest()[:10]
        for stem in sorted(os.listdir(tag_path)):
            p = os.path.join(tag_path, stem)
            live = (
                os.path.isdir(p)
                and ".build-" not in stem
                and stem.endswith(f"-{fp}")
                and os.path.exists(os.path.join(p, "_SUCCESS"))
            )
            if not live:
                (shutil.rmtree if os.path.isdir(p) else os.remove)(p)
                n_removed += 1
                print(f"pruned {tag}/{stem}")
        if not os.listdir(tag_path):
            os.rmdir(tag_path)
    print(f"prune: removed {n_removed} entries")
    return n_removed


def rebuild() -> None:
    from pyspark_recs.session import get_spark
    from pyspark_recs.workloads import QUERIES

    spark = get_spark()
    for sf in SF_DIRS:
        for name in WARM_QUERIES:
            QUERIES[name](spark, sf).count()
            print(f"warmed {name} @ {os.path.basename(sf)}", flush=True)
        C.unpersist_shared(spark)
    n = sum(len(files) for _, _, files in os.walk(C.ARTIFACT_ROOT))
    print(f"rebuild done: {n} files in {C.ARTIFACT_ROOT}")


def normalize() -> int:
    """Give every committed artifact file a STABLE name (VERDICT r12
    #8): Spark writes parquet parts as part-NNNNN-<random uuid>..., so
    a rebuild produces brand-new paths even when the bytes are
    identical and every round-close commit moved hundreds of binary
    blobs for nothing. Renaming to the deterministic part-NNNNN prefix
    (+ extension) and dropping Hadoop's optional .crc sidecars makes a
    content-identical rebuild a ZERO diff, and a changed artifact a
    same-path content diff. Parquet directory readers list by
    extension, not name, so reads are unaffected; the .crc files are
    LocalFS checksums that are simply absent afterwards (absent is
    valid; stale would error)."""
    n = 0
    for dirpath, _dirs, files in os.walk(C.ARTIFACT_ROOT):
        for f in sorted(files):
            p = os.path.join(dirpath, f)
            if f.endswith(".crc"):
                os.remove(p)
                n += 1
                continue
            if f.startswith("part-") and "-" in f[5:]:
                idx = f[5:].split("-", 1)[0]
                ext = ""
                for known_ext in (".snappy.parquet", ".zstd.parquet",
                                  ".parquet", ".json", ".csv"):
                    if f.endswith(known_ext):
                        ext = known_ext
                        break
                stable = os.path.join(dirpath, f"part-{idx}{ext}")
                if p != stable and not os.path.exists(stable):
                    os.rename(p, stable)
                    n += 1
    print(f"normalize: {n} files renamed/removed")
    return n


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "prune"
    unknown = "--unknown" in sys.argv
    if mode in ("prune", "both"):
        prune(unknown)
    if mode in ("rebuild", "both"):
        rebuild()
    if mode in ("rebuild", "both", "normalize"):
        normalize()
