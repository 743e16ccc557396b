"""F1 golden tests — parks normalization pipeline (EP1), pinning the
reference's semantic traps (SURVEY §7.4 / FIXTURES.md F1)."""

from __future__ import annotations

import json

import pytest

from yodel_etl_spark.pipelines import parks


@pytest.fixture(scope="module")
def parks_df(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("parks_json")
    # file 1: array of two objects (normalize_parks_json.py:143-147)
    (d / "a.json").write_text(
        json.dumps(
            [
                {
                    "name": "Alpha Park",
                    "facilities": "  Restroom, picnic tables, picnicking  ",
                    "restrictions": "No alcohol. Dogs allowed on-leash.",
                    "accessibility": "Accessible parking near entrance",
                    "activities": "hiking, swimming",
                    "metadata": {"source": "city", "tags": ["lake", "forest"]},
                },
                {
                    "name": "Beta Park",
                    "facilities": "quiet meadow only",
                    "restrictions": "no drones",
                    "activities": "frisbee golf",
                    "metadata": {"source": "county", "tags": []},
                },
            ]
        )
    )
    # file 2: single object, missing accessibility AND restrictions
    (d / "b.json").write_text(
        json.dumps(
            {
                "name": "Gamma Park",
                "facilities": "boat ramp, playground",
                "activities": "fishing, kayaking",
                "metadata": {"source": "state", "tags": ["river"]},
            }
        )
    )
    df = parks.normalize_parks(parks.read_parks_json(spark, str(d)))
    rows = {r["name"]: r.asDict() for r in df.collect()}
    assert len(rows) == 3
    return rows


def test_yes_before_no_trap(parks_df):
    # "No alcohol" matches the yes-pattern ("no alcohol" IS the keyword) →
    # Yes, and the bare-keyword-in-negation trap: yes fires before no.
    assert parks_df["Alpha Park"]["no_alcohol"] == "Yes"


def test_tristate_basic(parks_df):
    a = parks_df["Alpha Park"]
    assert a["has_restrooms"] == "Yes"           # trimmed + lowercased hit
    # word-boundary quirk (reference parity): "picnic tables" does NOT
    # match keyword "picnic table" (\b fails inside the plural), but
    # "picnicking" is its own keyword and hits.
    assert a["has_picnic_area"] == "Yes"
    assert a["dogs_allowed"] == "Yes"
    assert a["dogs_on_leash"] == "Yes"           # "on-leash"
    assert a["accessible_parking"] == "Yes"
    assert a["hiking"] == "Yes"
    assert a["swimming"] == "Yes"
    assert a["has_playground"] == "Don't Know"


def test_missing_column_injection(parks_df):
    # Gamma has no restrictions/accessibility fields at all → injected
    # null → tristate "Don't Know", residual null
    g = parks_df["Gamma Park"]
    assert g["no_alcohol"] == "Don't Know"
    assert g["accessible_parking"] == "Don't Know"
    # "nan"-literal quirk (reference parity, normalize_parks_json.py:161):
    # the column exists in other files, so Gamma's missing value went
    # through astype(str) → "nan", no keyword matches → residual keeps it.
    assert g["other_restrictions"] == "nan"
    assert g["has_boat_ramp"] == "Yes"
    assert g["fishing"] == "Yes"
    assert g["boating"] == "Yes"  # kayaking


def test_residual_column(parks_df):
    # Beta's facilities match no facility keyword → kept in other_facilities
    b = parks_df["Beta Park"]
    assert b["other_facilities"] == "quiet meadow only"
    # Alpha's facilities matched → residual suppressed
    assert parks_df["Alpha Park"]["other_facilities"] is None
    # Beta's activities "frisbee golf" → no activity keyword → residual kept
    assert b["other_activities"] == "frisbee golf"


def test_metadata_features_rollup(parks_df):
    feats = parks_df["Alpha Park"]["metadata.features"]
    assert "has restrooms" in feats
    assert "no alcohol" in feats
    assert "dogs on leash" in feats
    # underscores become spaces, comma-joined
    assert "_" not in feats
    b_feats = parks_df["Beta Park"]["metadata.features"]
    assert b_feats == "no drones"


def test_array_collapse_and_flatten(parks_df):
    # metadata.tags array → ", "-joined string under dotted name
    assert parks_df["Alpha Park"]["metadata.tags"] == "lake, forest"
    assert parks_df["Gamma Park"]["metadata.source"] == "state"
