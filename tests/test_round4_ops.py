"""Round-4 contract pins: the dashboard-panel completeness audit and the
distributed-rank helpers' registry integration."""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dashboard_panel_audit_maps_every_reference_surface():
    """Every SQL surface the reference exposes (Grafana rawSql, Makefile
    psql targets, Postgres views + retention function) must map to a
    registered query — the audit script exits non-zero on any gap, stale
    mapping, or a new technical-dashboard SQL panel."""
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "dashboard_panel_audit.py")],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=120,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "0 unmapped" in proc.stdout


def test_queries_md_appendix_is_current():
    """The committed QUERIES.md appendix must match what the audit script
    generates today (regenerate with --write after reference or mapping
    changes)."""
    from scripts.dashboard_panel_audit import BEGIN, END

    text = open(os.path.join(REPO, "QUERIES.md")).read()
    assert BEGIN in text and END in text
    block = text.split(BEGIN)[1].split(END)[0]
    # one row per mapped surface, no unmapped marker
    assert block.count("| `") >= 17
