"""The r13 verdict's bookkeeping find, institutionalized: ROTATION.md's
"exact 50-item list AS EXECUTED" tables must stay a mechanical mirror
of the `_R{N}_WINDOW` lists in driver_queries.py — window-vs-plan
diffs are only auditable if the doc can be parsed and compared
verbatim. Pure-python, no Spark session."""

from __future__ import annotations

import os
import re

import pytest

from clinical_data_lake_spark.driver_queries import (
    _R13_WINDOW,
    _R14_WINDOW,
    _R15_WINDOW,
)

_DOC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "ROTATION.md")


def _doc_window(round_no: int) -> list[str]:
    doc = open(_DOC).read()
    title = f"### r{round_no} window — exact 50-item list AS EXECUTED"
    i = doc.index(title)
    j = doc.find("###", i + 3)
    section = doc[i : j if j != -1 else len(doc)]
    names: list[str] = []
    for block in re.findall(r"Positions [\d-]+[^:]*:\s*(`[^`]+`)", section):
        names.extend(
            n for n in block.strip("`").split() if re.match(r"^[a-z0-9_]+$", n)
        )
    return names


@pytest.mark.parametrize(
    "round_no,window", [(13, _R13_WINDOW), (14, _R14_WINDOW), (15, _R15_WINDOW)]
)
def test_rotation_doc_table_matches_code_window(round_no, window):
    doc = _doc_window(round_no)
    assert doc == list(window), (
        f"ROTATION.md r{round_no} table diverges from _R{round_no}_WINDOW: "
        f"first diff at position "
        f"{next((k for k, (a, b) in enumerate(zip(doc, window)) if a != b), min(len(doc), len(window)))}"
    )
