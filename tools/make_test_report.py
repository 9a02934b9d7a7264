"""Round-stamped test report artifact (VERDICT r3 #5).

Parses a pytest junit XML into the committed TESTS_r{N}.json schema:
pass/fail/skip counts, wall duration, and the failing test ids, so "the
suite passes" is independently checkable per round.

Usage:
    python -m pytest tests/ -q --junitxml=/tmp/pytest_full.xml
    python tools/make_test_report.py /tmp/pytest_full.xml TESTS_r04.json
"""

from __future__ import annotations

import json
import sys
import time
import xml.etree.ElementTree as ET


def make_report(junit_xml: str) -> dict:
    root = ET.parse(junit_xml).getroot()
    suites = root.findall("testsuite") if root.tag == "testsuites" else [root]
    totals = {"tests": 0, "failures": 0, "errors": 0, "skipped": 0}
    duration = 0.0
    failing = []
    skipped_ids = []
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
        "failing_tests": failing,
        "skipped_tests": skipped_ids,
    }


if __name__ == "__main__":
    if len(sys.argv) != 3:
        sys.exit("usage: make_test_report.py <junit.xml> <out.json>")
    report = make_report(sys.argv[1])
    with open(sys.argv[2], "w") as f:
        json.dump(report, f, indent=2)
    print(f"{sys.argv[2]}: {report['passed']}/{report['total']} passed, "
          f"{report['failed']} failed, {report['skipped']} skipped in "
          f"{report['duration_s']}s")
    sys.exit(1 if report["failed"] else 0)
