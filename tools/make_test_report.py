"""Round-stamped test report artifact (VERDICT r3 #5 / r4 #2).

Produces the committed TESTS_r{N}.json schema — pass/fail/skip counts,
wall duration, certified commit, and failing test ids — so "the suite
passes" is independently checkable per round.

Two modes:

1. Parse existing junit XML(s)::

    python -m pytest tests/ -q --junitxml=/tmp/full.xml
    python tools/make_test_report.py TESTS_r05.json /tmp/full.xml

2. ``--run``: execute the suite FILE-BY-FILE, each test module in its own
   pytest process, retrying a module once if the process dies on a signal
   (this host's XLA:CPU native compile intermittently SEGFAULTS on long
   runs — observed at jax compiler.py backend_compile_and_load even with
   the AVX2 ISA cap and the persistent cache off, killing a monolithic
   run ~40% in and losing its junit output). Per-module isolation bounds
   the blast radius to one module, preserves every other module's
   results, and records how many crash-retries were needed::

    python tools/make_test_report.py --run TESTS_r05.json
"""

from __future__ import annotations

import glob
import json
import os
import signal
import subprocess
import sys
import tempfile
import time
import xml.etree.ElementTree as ET

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def make_report(junit_xmls) -> dict:
    if isinstance(junit_xmls, str):
        junit_xmls = [junit_xmls]
    totals = {"tests": 0, "failures": 0, "errors": 0, "skipped": 0}
    duration = 0.0
    failing = []
    skipped_ids = []
    for junit_xml in junit_xmls:
        root = ET.parse(junit_xml).getroot()
        suites = (root.findall("testsuite") if root.tag == "testsuites"
                  else [root])
        for s in suites:
            for k in totals:
                totals[k] += int(s.get(k, 0))
            duration += float(s.get("time", 0.0))
            for case in s.iter("testcase"):
                tid = f"{case.get('classname', '')}::{case.get('name', '')}"
                if case.find("failure") is not None or \
                        case.find("error") is not None:
                    failing.append(tid)
                elif case.find("skipped") is not None:
                    skipped_ids.append(tid)
    return {
        "generated": time.strftime("%Y-%m-%dT%H:%M:%S%z"),
        "total": totals["tests"],
        "passed": totals["tests"] - totals["failures"] - totals["errors"]
        - totals["skipped"],
        "failed": totals["failures"] + totals["errors"],
        "skipped": totals["skipped"],
        "duration_s": round(duration, 1),
        "commit": _head_commit(),
        "failing_tests": failing,
        "skipped_tests": skipped_ids,
    }


def _head_commit():
    """Record WHICH tree the suite certified (suite runs take ~an hour on
    this host; commits can land meanwhile)."""
    try:
        return subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                              capture_output=True, text=True, cwd=REPO,
                              timeout=10).stdout.strip() or None
    except Exception:
        return None


def run_suite(out_json: str, per_module_timeout: int = 3600) -> dict:
    """File-by-file suite execution with crash isolation + one retry."""
    files = sorted(glob.glob(os.path.join(REPO, "tests", "test_*.py")))
    xml_dir = tempfile.mkdtemp(prefix="segtpu_junit_")
    xmls, crashes, lost = [], [], []
    t0 = time.monotonic()
    for f in files:
        mod = os.path.splitext(os.path.basename(f))[0]
        xml = os.path.join(xml_dir, mod + ".xml")
        for attempt in (1, 2):
            t1 = time.monotonic()
            proc = subprocess.run(
                [sys.executable, "-m", "pytest", f, "-q",
                 f"--junitxml={xml}"],
                cwd=REPO, capture_output=True, text=True,
                timeout=per_module_timeout)
            dt = time.monotonic() - t1
            crashed = (proc.returncode < 0 or proc.returncode == 139
                       or proc.returncode == 134)
            tail = proc.stdout.strip().splitlines()
            print(f"[{mod}] rc={proc.returncode} {dt:.0f}s "
                  f"{tail[-1] if tail else ''}", flush=True)
            if not crashed:
                break
            sig = -proc.returncode if proc.returncode < 0 \
                else proc.returncode - 128
            crashes.append({"module": mod, "attempt": attempt,
                            "signal": signal.Signals(sig).name
                            if sig in signal.Signals._value2member_map_
                            else sig})
            if os.path.exists(xml):
                os.unlink(xml)  # partial XML from the crashed run
        if os.path.exists(xml):
            xmls.append(xml)
        else:
            lost.append(mod)
    report = make_report(xmls)
    report["wall_s"] = round(time.monotonic() - t0, 1)
    report["modules"] = len(files)
    report["crash_retries"] = crashes
    report["modules_lost_to_crashes"] = lost
    with open(out_json, "w") as fh:
        json.dump(report, fh, indent=2)
    print(f"{out_json}: {report['passed']}/{report['total']} passed, "
          f"{report['failed']} failed, {report['skipped']} skipped, "
          f"{len(crashes)} crash-retries, lost={lost}, "
          f"{report['wall_s']}s wall")
    return report


if __name__ == "__main__":
    args = sys.argv[1:]
    if args and args[0] == "--run":
        if len(args) != 2:
            sys.exit("usage: make_test_report.py --run <out.json>")
        rep = run_suite(args[1])
        sys.exit(1 if rep["failed"] or rep["modules_lost_to_crashes"]
                 else 0)
    if len(args) < 2:
        sys.exit("usage: make_test_report.py <out.json> <junit.xml>... "
                 "| --run <out.json>")
    # accept the legacy argument order (<junit.xml> <out.json>) too
    if args[0].endswith(".xml") and args[-1].endswith(".json"):
        out, xmls = args[-1], args[:-1]
    else:
        out, xmls = args[0], args[1:]
    report = make_report(xmls)
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(f"{out}: {report['passed']}/{report['total']} passed, "
          f"{report['failed']} failed, {report['skipped']} skipped in "
          f"{report['duration_s']}s")
    sys.exit(1 if report["failed"] else 0)
