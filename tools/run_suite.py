"""Crash-resilient full-suite runner → round-stamped TESTS_r{N}.json.

This host's XLA:CPU stack intermittently SEGFAULTS inside
`backend_compile_and_load` (observed 2026-08-18 killing a whole-suite
pytest process 58% in; the same file passes standalone). A single pytest
process therefore cannot be trusted to survive ~4000 compiles, so each
test FILE runs in its own pytest subprocess with its own junit XML; a
file whose process dies on a signal is retried once, and only a repeat
death is recorded (as an ``error`` entry). The per-file XMLs are merged
by tools/test_report.py.

    python tools/run_suite.py --round 4 --out TESTS_r04.json
        [--xml-dir /tmp/suite_xml] [--timeout 2400] [--slow]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def run_file(path: str, xml: str, timeout: int, extra) -> dict:
    """One pytest process for one test file. Returns a status record."""
    cmd = [sys.executable, "-m", "pytest", path, "-q", f"--junitxml={xml}",
           *extra]
    t0 = time.time()
    try:
        proc = subprocess.run(cmd, cwd=REPO, timeout=timeout,
                              capture_output=True, text=True)
        rc = proc.returncode
    except subprocess.TimeoutExpired:
        return {"file": path, "status": "timeout", "rc": None,
                "duration_s": round(time.time() - t0, 1)}
    # pytest rc: 0 ok, 1 failures, 5 no tests; < 0 / >= 128 → killed
    status = ("ok" if rc in (0, 5)
              else "failed" if rc == 1
              else "crashed")
    return {"file": path, "status": status, "rc": rc,
            "duration_s": round(time.time() - t0, 1),
            "tail": proc.stdout[-400:] if status != "ok" else ""}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--xml-dir", default="/tmp/suite_xml")
    ap.add_argument("--timeout", type=int, default=2400,
                    help="per-file timeout (s)")
    ap.add_argument("--slow", action="store_true",
                    help="pass --run-slow through")
    args = ap.parse_args()

    os.makedirs(args.xml_dir, exist_ok=True)
    for old in glob.glob(os.path.join(args.xml_dir, "*.xml")):
        os.remove(old)
    extra = ["--run-slow"] if args.slow else []

    files = sorted(glob.glob(os.path.join(REPO, "tests", "test_*.py")))
    records = []
    for path in files:
        name = os.path.splitext(os.path.basename(path))[0]
        xml = os.path.join(args.xml_dir, f"{name}.xml")
        rec = run_file(path, xml, args.timeout, extra)
        if rec["status"] in ("crashed", "timeout"):
            print(f"{name}: {rec['status']} (rc={rec['rc']}) — retrying",
                  flush=True)
            rec = run_file(path, xml, args.timeout, extra)
            rec["retried"] = True
        records.append(rec)
        print(f"{name}: {rec['status']} in {rec['duration_s']}s", flush=True)

    # merge per-file XMLs into the round report
    sys.path.insert(0, HERE)
    from test_report import summarize
    merged = {"total": 0, "passed": 0, "failed": 0, "errors": 0,
              "skipped": 0, "duration_s": 0.0, "failures": []}
    for path in sorted(glob.glob(os.path.join(args.xml_dir, "*.xml"))):
        s = summarize(path)
        for k in ("total", "passed", "failed", "errors", "skipped"):
            merged[k] += s[k]
        merged["duration_s"] = round(merged["duration_s"] + s["duration_s"],
                                     1)
        merged["failures"].extend(s["failures"])
    # files whose process died twice have no (complete) XML — record them
    hard = [r for r in records if r["status"] in ("crashed", "timeout")]
    for r in hard:
        merged["errors"] += 1
        merged["failures"].append({
            "test": r["file"], "kind": "error",
            "message": f"pytest process {r['status']} (rc={r['rc']}) "
                       f"twice — XLA:CPU stack instability, see tail: "
                       f"{r.get('tail', '')[:300]}"})

    report = {"round": args.round,
              "date": time.strftime("%Y-%m-%dT%H:%M:%S%z"),
              "runner": "tools/run_suite.py (per-file crash isolation)",
              **merged,
              "files": records}
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
        f.write("\n")
    print(json.dumps({k: report[k] for k in
                      ("round", "total", "passed", "failed", "errors",
                       "skipped", "duration_s")}))
    return 0 if merged["failed"] == 0 and merged["errors"] == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
