"""Run-provenance capture (SURVEY §2.12 G1-G3).

The reference stamps every pipeline run with git commit/origin/version
of each workflow file (dags/utils.py:526-697) and assembles RO-crate
run manifests (dags/crate_manager.py:31-135).  Here provenance is a
small driver-side capture appended to results as literal columns or
emitted as a one-row run-manifest DataFrame — metadata capture is not
distributed work and should never cost a job.
"""

from __future__ import annotations

import datetime
import os
import subprocess

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def git_provenance(repo_dir: str | None = None) -> dict[str, str]:
    """Best-effort git metadata for the engine code itself."""
    repo_dir = repo_dir or os.path.dirname(os.path.abspath(__file__))
    out: dict[str, str] = {"origin": "", "commit": ""}
    try:
        out["commit"] = subprocess.run(
            ["git", "rev-parse", "HEAD"],
            cwd=repo_dir, capture_output=True, text=True, timeout=10,
        ).stdout.strip()
        origin = subprocess.run(
            ["git", "remote", "get-url", "origin"],
            cwd=repo_dir, capture_output=True, text=True, timeout=10,
        ).stdout.strip()
        # git@host:org/repo.git → https://host/org/repo (utils.py:550-559 shape)
        if origin.startswith("git@"):
            origin = "https://" + origin[4:].replace(":", "/", 1)
        out["origin"] = origin.removesuffix(".git")
    except Exception:
        pass
    return out


def run_manifest(
    spark: SparkSession, run_id: str, inputs: list[str], extra: dict[str, str] | None = None
) -> DataFrame:
    """One-row run manifest: run_id, engine git info, inputs, UTC stamp."""
    prov = git_provenance()
    row = {
        "run_id": run_id,
        "commit": prov["commit"],
        "origin": prov["origin"],
        "inputs": inputs,
        "created_utc": datetime.datetime.now(datetime.timezone.utc).isoformat(),
    }
    if extra:
        row.update(extra)
    return spark.createDataFrame([row])


def with_provenance(df: DataFrame, run_id: str) -> DataFrame:
    """Stamp result rows with run provenance as literal columns (G1)."""
    prov = git_provenance()
    return df.withColumn("run_id", F.lit(run_id)).withColumn(
        "engine_commit", F.lit(prov["commit"])
    )
