"""Train-once warehouse artifact addressing.

The content-keyed persisted-model seam used by the IVF/PQ codebooks,
the dedup label stars, and the BPE tokenizer artifacts: an artifact
path folds in (a) the absolute corpus path, (b) a parquet-footer
content fingerprint, and (c) the algorithm constants — so regenerated
data or a changed spec RETRAINS instead of silently reusing a stale
artifact (advice r5, verdict r8 #2).
"""

from __future__ import annotations

import hashlib
import os


def table_fingerprint(sf_dir: str, table: str = "documents") -> str:
    """Cheap CONTENT key: parquet-footer row count + file byte size
    (metadata only — no data scan, no SparkSession, callable at
    import time by oracle builders). Empty if the file is absent."""
    p = os.path.join(os.path.abspath(os.path.normpath(sf_dir)),
                     f"{table}.parquet")
    try:
        import pyarrow.parquet as _pq
        return f"n{_pq.ParquetFile(p).metadata.num_rows}b{os.path.getsize(p)}"
    except Exception:
        return ""


def artifact_path(sf_dir: str, name: str, algo: str = "",
                  table: str = "documents") -> str:
    """Deterministic spark-warehouse location for a corpus-derived
    artifact, keyed by absolute path + content fingerprint + the
    algorithm constants."""
    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    abspath = os.path.abspath(os.path.normpath(sf_dir))
    base = os.path.basename(abspath).replace(".", "_")
    digest = hashlib.md5(
        f"{abspath}|{table_fingerprint(sf_dir, table)}|{algo}".encode()
    ).hexdigest()[:10]
    return os.path.join(repo_root, "spark-warehouse",
                        f"{name}_{base}_{digest}")
