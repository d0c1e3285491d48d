"""CI check: the README's driver-verified perf table is generated from the
newest BENCH_r*.json (tools/readme_bench.py) and must never go stale or be
hand-edited (VERDICT r3 #7 — headline-number drift across docs)."""

import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

import readme_bench  # noqa: E402


def test_readme_bench_table_is_fresh():
    assert readme_bench.apply(check=True), (
        "README.md bench table is stale — run `python tools/readme_bench.py`"
    )


def test_readme_headline_matches_latest_artifact():
    _, artifact = readme_bench.latest_bench()
    headline = artifact["parsed"]["value"]
    with open(os.path.join(REPO, "README.md")) as f:
        text = f.read()
    block = re.search(
        re.escape(readme_bench.BEGIN) + r".*?" + re.escape(readme_bench.END),
        text,
        re.DOTALL,
    )
    assert block and str(headline) in block.group(0)


def test_cli_check_mode_detects_staleness(tmp_path):
    """--check exits 1 when the table does not match the artifacts."""
    # copy the repo docs into a sandbox and corrupt the table
    import shutil

    os.makedirs(tmp_path / "tools")
    shutil.copy(
        os.path.join(REPO, "tools", "readme_bench.py"), tmp_path / "tools"
    )
    for p in sorted(os.listdir(REPO)):
        if re.fullmatch(r"BENCH_r\d+\.json", p):
            shutil.copy(os.path.join(REPO, p), tmp_path / p)
    with open(os.path.join(REPO, "README.md")) as f:
        text = f.read()
    corrupt = re.sub(
        re.escape(readme_bench.BEGIN) + r".*?" + re.escape(readme_bench.END),
        readme_bench.BEGIN + "\ncorrupt\n" + readme_bench.END,
        text,
        flags=re.DOTALL,
    )
    with open(tmp_path / "README.md", "w") as f:
        f.write(corrupt)
    proc = subprocess.run(
        [sys.executable, str(tmp_path / "tools" / "readme_bench.py"), "--check"],
        capture_output=True,
        text=True,
    )
    assert proc.returncode == 1, proc.stdout + proc.stderr


def test_latest_bench_sorts_rounds_numerically(tmp_path):
    """BENCH_r100 must beat BENCH_r99 — lexicographic sorting would pin a
    stale round's numbers as the 'driver-verified' headline forever."""
    import json

    for n, v in ((2, 10.0), (100, 20.0), (99, 15.0)):
        with open(tmp_path / f"BENCH_r{n:02d}.json", "w") as f:
            json.dump({"parsed": {"value": v, "unit": "clips/s"}}, f)
    name, artifact = readme_bench.latest_bench(repo=str(tmp_path))
    assert name == "BENCH_r100.json"
    assert artifact["parsed"]["value"] == 20.0
    rows = readme_bench.history(repo=str(tmp_path))
    assert [r[0] for r in rows] == [
        "BENCH_r02.json", "BENCH_r99.json", "BENCH_r100.json"
    ]
