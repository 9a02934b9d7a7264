"""Convert a pytest junit XML into the round-stamped TESTS_r{N}.json.

VERDICT r3 #5: "the suite passes" must be independently checkable per
round. Run:

    python -m pytest tests/ -q --junitxml=/tmp/tests.xml
    python tools/test_report.py /tmp/tests.xml --round 4 --out TESTS_r04.json
"""

from __future__ import annotations

import argparse
import json
import sys
import time
import xml.etree.ElementTree as ET


def summarize(junit_path: str) -> dict:
    root = ET.parse(junit_path).getroot()
    suites = root.findall("testsuite") if root.tag == "testsuites" else [root]
    total = passed = failed = errors = skipped = 0
    duration = 0.0
    failures = []
    for s in suites:
        total += int(s.get("tests", 0))
        failed += int(s.get("failures", 0))
        errors += int(s.get("errors", 0))
        skipped += int(s.get("skipped", 0))
        duration += float(s.get("time", 0.0))
        for case in s.iter("testcase"):
            for kind in ("failure", "error"):
                node = case.find(kind)
                if node is not None:
                    failures.append({
                        "test": f"{case.get('classname')}::{case.get('name')}",
                        "kind": kind,
                        "message": (node.get("message") or "")[:500],
                    })
    passed = total - failed - errors - skipped
    return {
        "total": total,
        "passed": passed,
        "failed": failed,
        "errors": errors,
        "skipped": skipped,
        "duration_s": round(duration, 1),
        "failures": failures,
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("junit_xml")
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    report = summarize(args.junit_xml)
    report = {
        "round": args.round,
        "date": time.strftime("%Y-%m-%dT%H:%M:%S%z"),
        **report,
    }
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
        f.write("\n")
    print(json.dumps({k: v for k, v in report.items() if k != "failures"}))
    return 0 if report["failed"] == 0 and report["errors"] == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
