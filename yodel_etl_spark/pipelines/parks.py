"""Parks normalization pipeline — EP1 (normalize_parks_json.py end-to-end).

Reference shape (SURVEY §3 EP1): JSON dir scan → flatten → trim →
ensure-columns → 4 keyword maps (42 flags + 4 residuals) → active-feature
roll-up → CSV.  Here: one lazy DAG, single stage, zero shuffles —
`read.json → select(flatten) → select(flags…) → write.csv` — that scales
to any file count (Spark splits the scan per file/partition instead of
pd.concat-ing everything into one host's RAM,
normalize_parks_json.py:138-152).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from yodel_etl_spark.ops.classify import active_features, apply_flag_map
from yodel_etl_spark.ops.cleanse import ensure_columns, trim_all
from yodel_etl_spark.ops.flatten import flatten

# Keyword maps — behavioral data of the reference
# (normalize_parks_json.py:66-129), kept verbatim for output parity.
FACILITIES_MAP = {
    "has_restrooms": ["restroom", "toilet"],
    "has_picnic_area": ["picnic area", "picnic table", "picnicking"],
    "has_pavilion": ["pavilion", "shade pavilion"],
    "has_playground": ["playground"],
    "has_boat_ramp": ["boat ramp", "boat launch"],
    "has_grills": ["grill", "grilling"],
    "has_showers": ["shower", "bathhouse"],
    "has_visitor_center": ["visitor center", "visitors center", "info booth"],
    "has_scenic_view": ["scenic view", "overlook", "observation tower"],
}
RESTRICTIONS_MAP = {
    "no_alcohol": ["no alcohol", "no alcoholic"],
    "dogs_allowed": ["dogs allowed", "pets allowed"],
    "dogs_on_leash": ["on-leash", "on leash", "must remain on-leash"],
    "no_fires_or_grills": ["no fires", "no grilling", "no firewood"],
    "carry_in_carry_out": ["carry-in", "carry out", "lug in", "lug out"],
    "no_motorized_vehicles": ["no motorized", "no atv", "no ohv"],
    "no_swimming": ["no swimming", "swimming prohibited"],
    "no_hunting_or_fishing": ["no hunting", "no fishing"],
    "no_drones": ["no drones", "no drone"],
    "service_animals_allowed": ["service animal", "except service animals"],
}
ACCESSIBILITY_MAP = {
    "accessible_restrooms": ["accessible restrooms", "accessible toilet"],
    "accessible_beach": ["accessible beach", "beach mat", "beach wheelchair"],
    "accessible_parking": ["accessible parking"],
    "accessible_trails": ["accessible trail", "accessible hiking"],
    "accessible_camping": ["accessible camping", "accessible campsites"],
    "accessible_picnicking": ["accessible picnicking", "accessible pavilion"],
    "accessible_visitors_center": [
        "accessible visitor center",
        "accessible visitors center",
        "accessible nature center",
    ],
    "accessible_fishing": ["accessible fishing", "accessible pier"],
    "adaptive_recreation_programs": [
        "adaptive recreation",
        "adaptive sports",
        "spaulding adaptive",
    ],
}
ACTIVITIES_MAP = {
    "hiking": ["hiking", "walk", "trail"],
    "biking": ["biking", "cycling", "bike"],
    "camping": ["camping", "campground"],
    "fishing": ["fishing", "angling"],
    "boating": ["boating", "canoeing", "kayaking", "sailing"],
    "swimming": ["swimming", "swim", "beach"],
    "picnicking": ["picnicking", "picnic"],
    "hunting": ["hunting", "hunt"],
    "horseback_riding": ["horseback", "equestrian"],
    "wildlife_watching": ["bird watching", "nature watching", "wildlife"],
    "winter_sports": ["skiing", "snowmobiling", "ice skating"],
    "rock_climbing": ["rock climbing", "climb"],
    "educational_programs": ["educational", "tours", "guided tour"],
    "events": ["concert", "community event", "triathlon"],
}

SOURCE_MAPS = (
    ("facilities", FACILITIES_MAP, "other_facilities"),
    ("restrictions", RESTRICTIONS_MAP, "other_restrictions"),
    ("accessibility", ACCESSIBILITY_MAP, "other_accessibility_features"),
    ("activities", ACTIVITIES_MAP, "other_activities"),
)

#: flag-column selection rule (normalize_parks_json.py:193-199)
FLAG_PREFIXES = ("has_", "no_", "accessible_", "dogs_", "service_", "carry_")
ACTIVITY_FLAGS = tuple(ACTIVITIES_MAP.keys())


def read_parks_json(spark: SparkSession, input_dir: str) -> DataFrame:
    """S1: multiLine JSON dir scan — a file may hold one object or an
    array of objects (normalize_parks_json.py:143-147); Spark's multiLine
    reader accepts both natively and parallelizes across files."""
    return spark.read.option("multiLine", True).json(f"{input_dir}/*.json")


def flag_columns(df: DataFrame) -> list[str]:
    """Name-based flag selection, order-preserving
    (normalize_parks_json.py:193-199)."""
    return [
        c
        for c in df.columns
        if c.startswith(FLAG_PREFIXES) or c in ACTIVITY_FLAGS
    ]


def normalize_parks(df: DataFrame) -> DataFrame:
    """The full normalization DAG from a raw (possibly nested) frame."""
    df = flatten(df)
    df = trim_all(df, pandas_nan_literal=True)
    df = ensure_columns(df, [s for s, _, _ in SOURCE_MAPS])
    for source, mapping, other in SOURCE_MAPS:
        df = apply_flag_map(df, source, mapping, other)
    return df.withColumn("metadata.features", active_features(flag_columns(df)))


def run(spark: SparkSession, input_dir: str, output_path: str | None = None) -> DataFrame:
    """EP1 end-to-end; writes reference-parity CSV when ``output_path``."""
    out = normalize_parks(read_parks_json(spark, input_dir))
    if output_path:
        out.write.mode("overwrite").option("header", True).csv(output_path)
    return out


if __name__ == "__main__":  # pragma: no cover - CLI shim
    import sys

    from yodel_etl_spark.cli import parks_main

    sys.exit(parks_main())
