"""Repo self-check: the local twin of the driver's LEAKCHECK / COPYCHECK
gates, so regressions surface in one `make check` run instead of at the
end of a round.

1. Leak scan — the package must derive from public knowledge only: flag
   non-public-looking URLs, cloud bucket URIs, and environment variables
   outside the repo's own SPARK_GRAFT_* namespace (plus the standard
   JAVA_/SPARK_/PYSPARK_ families).
2. Copy scan — difflib similarity of every package .py against every
   reference .py at /root/reference (threshold 0.6, the driver's
   COPYCHECK setting).  The reference is studied for BEHAVIOR, never
   copied; a high ratio means a rewrite got too close.

Exit code 0 = clean; 1 = findings (printed one per line).
"""

from __future__ import annotations

import difflib
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
PKG = REPO / "ominimo_dynamic_data_pipeline_spark"
REFERENCE = Path("/root/reference")

ALLOWED_URL_HOSTS = (
    "spark.apache.org",
    "github.com",
    "datasketches.apache.org",
    "duckdb.org",
    "www.w3.org",
    "localhost",
    "airflow.apache.org",
    "repo.maven.apache.org",
)
ENV_OK = re.compile(
    r"^(SPARK_GRAFT_|SPARK_|PYSPARK_|JAVA_|PATH$|HOME$|PYTHON|TZ$|USER$|TMPDIR$)"
)


def leak_scan() -> list[str]:
    findings: list[str] = []
    files = list(PKG.rglob("*.py")) + [
        REPO / "bench.py",
        REPO / "__spark_entry__.py",
        *(REPO / "tools").glob("*.py"),
        *(REPO / "examples").glob("*.json"),
    ]
    url_re = re.compile(r"https?://([\w.-]+)")
    bucket_re = re.compile(r"\b(s3a?|gs|wasbs?|abfss?)://[\w./-]+")
    env_re = re.compile(r"(?:os\.environ(?:\.get)?\(|getenv\()\s*[\"']([A-Z0-9_]+)")
    for f in files:
        text = f.read_text(errors="replace")
        for m in url_re.finditer(text):
            host = m.group(1)
            if not any(host.endswith(a) for a in ALLOWED_URL_HOSTS):
                findings.append(f"{f.relative_to(REPO)}: non-public URL host {host}")
        for m in bucket_re.finditer(text):
            findings.append(f"{f.relative_to(REPO)}: cloud bucket URI {m.group(0)}")
        for m in env_re.finditer(text):
            if not ENV_OK.match(m.group(1)):
                findings.append(
                    f"{f.relative_to(REPO)}: unexpected env var {m.group(1)}"
                )
    return findings


def copy_scan(threshold: float = 0.6) -> list[str]:
    if not REFERENCE.is_dir():
        return []
    ref_files = [
        p
        for p in REFERENCE.rglob("*.py")
        if "test" not in p.name and p.stat().st_size > 200
    ]
    findings: list[str] = []
    for mine in PKG.rglob("*.py"):
        mtext = mine.read_text(errors="replace")
        if len(mtext) < 200:
            continue
        for ref in ref_files:
            rtext = ref.read_text(errors="replace")
            # quick_ratio upper-bounds ratio; only pay for the real ratio
            # when the cheap bound crosses the threshold
            sm = difflib.SequenceMatcher(None, mtext, rtext)
            if sm.quick_ratio() >= threshold and sm.ratio() >= threshold:
                findings.append(
                    f"{mine.relative_to(REPO)} ~ {ref}: similarity "
                    f"{sm.ratio():.2f} >= {threshold}"
                )
    return findings


def main() -> int:
    findings = leak_scan() + copy_scan()
    for f in findings:
        print(f"SELFCHECK: {f}")
    print(f"selfcheck: {len(findings)} finding(s)")
    return 1 if findings else 0


if __name__ == "__main__":
    sys.exit(main())
