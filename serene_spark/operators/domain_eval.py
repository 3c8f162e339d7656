"""Domain evaluation utilities — the reference's ``eval/datasetutils`` layer.

The reference ships one trait per evaluation domain
(matcher/src/main/scala/au/csiro/data61/matcher/matcher/eval/datasetutils/):
``WISCRealEstate1DomainUtils.scala`` (5 real-estate XML sources + pos/ambig
labels, partitioned BY DATASET), ``AusGovDataToiletsDomainUtils.scala`` /
``USGovDataCarParkingDomainUtils.scala`` (a directory of open-gov CSVs +
``CsvLabelsLoader`` positive label sets, partitioned BY ATTRIBUTE) and
``SimpleTestDBUtils.scala`` (two tiny CSV databases + gt.csv).  Each trait is
loadDataSets + loadLabels + a partition strategy delegating to
``DataPartitioner.scala``.

The original fixture corpora (WISC real-estate crawl, data.gov.au toilets,
data.gov car parks) are not redistributable, so each domain here synthesizes a
deterministic stand-in with the same shape — multiple sources, shared semantic
classes, per-source naming diversity — and routes it through the repo's REAL
ingestion path (``sources.csv_loader.load_csv``, ``sources.labels_loader``)
rather than building DataFrames directly, so the loaders themselves are
exercised end-to-end.

Partitioner parity notes (DataPartitioner.scala:17-56 by-attribute, :61-86
by-dataset):

* label split size is ``floor(prop_train * n_labels)``; the remainder is test
  (``takeRight``);
* unlabeled attributes are assigned per-dataset with an independent draw
  ``rand <= prop_train`` so each dataset contributes ~the same proportion;
* by-dataset keeps a positive label set only while it still references >1
  attribute inside its side of the split (``.filter(_.size > 1)``) — a set
  reduced to a single attribute can no longer assert a match;
* divergence: the reference shuffles via the GLOBAL ``scala.util.Random``
  object even though it threads a seeded ``randNumGenerator`` (a latent
  nondeterminism bug) — here the seeded generator drives the shuffle too, so
  splits are reproducible.
"""

from __future__ import annotations

import os
import random
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

PosLabels = list[set[str]]
AmbigLabels = list[tuple[set[str], set[str]]]
AttrsByDataset = dict[str, list[str]]
Split = tuple[tuple[AttrsByDataset, PosLabels], tuple[AttrsByDataset, PosLabels]]


def partition_by_attribute(
    attrs_by_dataset: AttrsByDataset,
    pos_labels: PosLabels,
    prop_train: float,
    seed: int = 1000,
) -> Split:
    """``DataPartitioner.partitionByAttribute`` (DataPartitioner.scala:17-56).

    Splits label SETS first (floor split over a seeded shuffle), then assigns
    every remaining attribute of every dataset independently with probability
    ``prop_train`` — so each dataset contributes roughly the same train/test
    proportion.  Attributes named by a train (test) label always land in
    train (test).
    """
    rng = random.Random(seed)
    n_train = int(prop_train * len(pos_labels))
    shuffled = list(pos_labels)
    rng.shuffle(shuffled)
    train_labels, test_labels = shuffled[:n_train], shuffled[n_train:]
    train_attr_ids = set().union(*train_labels) if train_labels else set()
    test_attr_ids = set().union(*test_labels) if test_labels else set()

    train_attrs: AttrsByDataset = {}
    test_attrs: AttrsByDataset = {}
    for ds_id, attrs in attrs_by_dataset.items():
        tr: list[str] = []
        te: list[str] = []
        for a in attrs:
            if a in train_attr_ids:
                tr.append(a)
            elif a in test_attr_ids:
                te.append(a)
            elif rng.random() <= prop_train:
                tr.append(a)
            else:
                te.append(a)
        train_attrs[ds_id] = tr
        test_attrs[ds_id] = te
    return (train_attrs, train_labels), (test_attrs, test_labels)


def partition_by_dataset(
    attrs_by_dataset: AttrsByDataset,
    pos_labels: PosLabels,
    prop_train: float,
    seed: int = 1000,
) -> Split:
    """``DataPartitioner.partitionByDataSet`` (DataPartitioner.scala:61-86).

    Whole datasets (sources) go to one side; each positive label set is
    intersected with its side's attributes and kept only while >1 attribute
    survives (a singleton set can no longer assert any match).
    """
    rng = random.Random(seed)
    ds_ids = list(attrs_by_dataset)
    n_train = int(prop_train * len(ds_ids))
    shuffled = list(ds_ids)
    rng.shuffle(shuffled)
    train_ids, test_ids = set(shuffled[:n_train]), set(shuffled[n_train:])

    train_attr_ids = {a for d in train_ids for a in attrs_by_dataset[d]}
    test_attr_ids = {a for d in test_ids for a in attrs_by_dataset[d]}
    train_labels = [s & train_attr_ids for s in pos_labels]
    train_labels = [s for s in train_labels if len(s) > 1]
    test_labels = [s & test_attr_ids for s in pos_labels]
    test_labels = [s for s in test_labels if len(s) > 1]

    return (
        ({d: attrs_by_dataset[d] for d in sorted(train_ids)}, train_labels),
        ({d: attrs_by_dataset[d] for d in sorted(test_ids)}, test_labels),
    )


@dataclass
class Domain:
    """One evaluation domain = datasets + labels + a partition strategy,
    mirroring the per-domain traits' ``loadDataSets``/``loadLabels``/
    ``partitionDataSet`` surface."""

    name: str
    load_datasets: Callable[[SparkSession], dict[str, DataFrame]]
    load_labels: Callable[[], tuple[PosLabels, AmbigLabels]]
    partition_strategy: Callable[..., Split] = field(default=partition_by_attribute)

    def attrs_by_dataset(self, spark: SparkSession) -> AttrsByDataset:
        return {
            ds_id: list(df.columns) for ds_id, df in self.load_datasets(spark).items()
        }

    def partition(self, spark: SparkSession, prop_train: float, seed: int = 1000) -> Split:
        pos, _ambig = self.load_labels()
        return self.partition_strategy(
            self.attrs_by_dataset(spark), pos, prop_train, seed
        )


# --------------------------------------------------------------------------
# Synthetic stand-in corpora.  Written once per workdir, then loaded through
# the real CSV ingestion path so header heuristics / empty-row drops run.
# --------------------------------------------------------------------------

_REGION_SEEDS = {"NSW": 11, "VIC": 12, "QLD": 13, "WA": 14}
_US_CITY_SEEDS = {"dc": 21, "seattle": 22, "chicago": 23}


def _write_csv_file(path: str, header: list[str], rows: list[list[str]]) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w", encoding="utf-8", newline="") as fh:
        fh.write(",".join(header) + "\n")
        for r in rows:
            fh.write(",".join(r) + "\n")


def _toilet_rows(rng: random.Random, n: int) -> list[list[str]]:
    towns = ["Parkes", "Dubbo", "Cairns", "Ballarat", "Albany", "Hobart"]
    return [
        [
            f"{rng.choice(['Memorial', 'Riverside', 'Central', 'Lions'])} Park Toilets",
            f"{rng.randint(1, 400)} {rng.choice(['High St', 'Main Rd', 'Park Ave'])}",
            rng.choice(towns),
            f"{-rng.randint(10, 43)}.{rng.randint(0, 999999):06d}",
            f"{rng.randint(113, 153)}.{rng.randint(0, 999999):06d}",
            rng.choice(["True", "False"]),
            rng.choice(["24 hours", "9am-5pm", "dawn-dusk"]),
        ]
        for _ in range(n)
    ]


def make_ausgov_toilets_corpus(workdir: str) -> tuple[str, str]:
    """AusGovDataToiletsDomainUtils stand-in: one CSV per region under
    ``<workdir>/Toilets/AU`` + ``AU_labels.txt`` positive label sets.

    Per-region header aliases differ (name vs facility_name, town vs
    locality…) so the positive label sets are non-trivial.
    """
    base = os.path.join(workdir, "Toilets", "AU")
    headers = {
        "NSW": ["name", "address", "town", "latitude", "longitude", "accessible", "opening_hours"],
        "VIC": ["facility_name", "street_address", "locality", "lat", "lon", "wheelchair_access", "hours"],
        "QLD": ["toilet_name", "addr", "suburb", "y_coord", "x_coord", "access_flag", "open_times"],
        "WA": ["site_name", "location", "town_name", "latitude_deg", "longitude_deg", "accessible", "availability"],
    }
    for region, seed in _REGION_SEEDS.items():
        rng = random.Random(seed)
        _write_csv_file(
            os.path.join(base, f"{region}.csv"), headers[region], _toilet_rows(rng, 40)
        )
    # CsvLabelsLoader format: one comma-separated set of attr ids per line
    # (CsvLabelsLoader.scala:6-13); attr ids are name@table@dataset.
    classes = list(zip(*headers.values()))
    labels_path = os.path.join(workdir, "Toilets", "AU_labels.txt")
    with open(labels_path, "w", encoding="utf-8") as fh:
        fh.write("# synthetic AU toilets ground truth\n")
        for cls_cols in classes:
            ids = [
                f"{col}@{region}@AU"
                for col, region in zip(cls_cols, headers.keys())
            ]
            fh.write(",".join(ids) + "\n")
    return base, labels_path


def _parking_rows(rng: random.Random, n: int) -> list[list[str]]:
    return [
        [
            f"LOT-{rng.randint(100, 999)}",
            f"{rng.randint(1, 2000)} {rng.choice(['K St NW', '4th Ave', 'Wacker Dr'])}",
            str(rng.randint(10, 900)),
            rng.choice(["surface", "garage", "underground"]),
            f"${rng.choice(['1.50', '2.00', '3.25', '4.00'])}/hr",
        ]
        for _ in range(n)
    ]


def make_usgov_carparking_corpus(workdir: str) -> tuple[str, str]:
    """USGovDataCarParkingDomainUtils stand-in under
    ``<workdir>/CarParkingSpaces/US`` + ``US_labels.txt``."""
    base = os.path.join(workdir, "CarParkingSpaces", "US")
    headers = {
        "dc": ["lot_id", "address", "spaces", "lot_type", "rate"],
        "seattle": ["parking_id", "street_address", "capacity", "facility_type", "hourly_rate"],
        "chicago": ["id", "location", "num_spaces", "type", "price_per_hour"],
    }
    for city, seed in _US_CITY_SEEDS.items():
        rng = random.Random(seed)
        _write_csv_file(
            os.path.join(base, f"{city}.csv"), headers[city], _parking_rows(rng, 30)
        )
    classes = list(zip(*headers.values()))
    labels_path = os.path.join(workdir, "CarParkingSpaces", "US_labels.txt")
    with open(labels_path, "w", encoding="utf-8") as fh:
        for cls_cols in classes:
            fh.write(
                ",".join(
                    f"{col}@{city}@US" for col, city in zip(cls_cols, headers.keys())
                )
                + "\n"
            )
    return base, labels_path


def _csv_dir_domain(name: str, base: str, labels_path: str, dataset_tag: str) -> Domain:
    """CSV-directory domain (AusGov/USGov shape): every ``*.csv`` in the dir
    is one table of one dataset; attr ids are ``column@table@dataset``
    (CsvDataLoader.scala:98-102 lineage)."""
    from serene_spark.sources.csv_loader import load_csv
    from serene_spark.sources.labels_loader import load_positive_only

    def load_datasets(spark: SparkSession) -> dict[str, DataFrame]:
        out: dict[str, DataFrame] = {}
        for fname in sorted(os.listdir(base)):
            if not fname.endswith(".csv"):
                continue
            table = fname[:-4]
            df = load_csv(spark, os.path.join(base, fname))
            df = df.toDF(*[f"{c}@{table}@{dataset_tag}" for c in df.columns])
            out[table] = df
        return out

    def load_labels() -> tuple[PosLabels, AmbigLabels]:
        return load_positive_only(labels_path), []

    return Domain(name, load_datasets, load_labels, partition_by_attribute)


def ausgov_toilets_domain(workdir: str) -> Domain:
    """``AusGovDataToiletsDomainUtils`` analog (partition BY ATTRIBUTE)."""
    base, labels = make_ausgov_toilets_corpus(workdir)
    return _csv_dir_domain("ausgov_toilets", base, labels, "AU")


def usgov_carparking_domain(workdir: str) -> Domain:
    """``USGovDataCarParkingDomainUtils`` analog (partition BY ATTRIBUTE)."""
    base, labels = make_usgov_carparking_corpus(workdir)
    return _csv_dir_domain("usgov_carparking", base, labels, "US")


def wisc_realestate1_domain(n_sources: int = 5) -> Domain:
    """``WISCRealEstate1DomainUtils`` analog: multiple real-estate listing
    sources sharing 17 semantic classes, pos+ambig labels, partition BY
    DATASET (the trait's strategy, WISCRealEstate1DomainUtils.scala:37-39).

    Sources come from the homeseekers-analog generator (the same fixture the
    17-class accuracy gate trains on), one dataset per listing feed.
    """
    from serene_spark.ml.homeseekers_fixture import make_homeseekers_long

    def load_datasets(spark: SparkSession) -> dict[str, DataFrame]:
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        long_df, _ = make_homeseekers_long(spark, n_sources=n_sources)
        # source s owns every column suffixed "#s"; rebuild each feed as a
        # wide table by sequence-numbering values within each column and
        # pivoting (fixture-sized relation; generation order is the row order)
        w = Window.partitionBy("column_name").orderBy(F.monotonically_increasing_id())
        numbered = long_df.withColumn("rn", F.row_number().over(w))
        cols = [r[0] for r in long_df.select("column_name").distinct().collect()]
        out: dict[str, DataFrame] = {}
        for s in range(n_sources):
            mine = sorted(c for c in cols if c.endswith(f"#{s}"))
            out[f"src{s}"] = (
                numbered.filter(numbered.column_name.isin(mine))
                .groupBy("rn")
                .pivot("column_name", mine)
                .agg(F.first("value"))
                .drop("rn")
            )
        return out

    def load_labels() -> tuple[PosLabels, AmbigLabels]:
        from serene_spark.ml.homeseekers_fixture import (
            HOMESEEKERS_CLASSES,
            source_columns_by_class,
        )

        pos = [
            set(cols)
            for cls, cols in source_columns_by_class(n_sources).items()
            if cls != "unknown" and len(cols) > 1
        ]
        # ambiguous pair: the two count-like classes whose raw digits collide
        by_cls = source_columns_by_class(n_sources)
        ambig: AmbigLabels = [(set(by_cls["bathrooms"]), set(by_cls["bedrooms"]))]
        assert set(by_cls) == set(HOMESEEKERS_CLASSES)
        return pos, ambig

    def _attrs(spark: SparkSession) -> AttrsByDataset:
        from serene_spark.ml.homeseekers_fixture import source_columns_by_class

        by_cls = source_columns_by_class(n_sources)
        out: AttrsByDataset = {f"src{s}": [] for s in range(n_sources)}
        for cols in by_cls.values():
            for c in cols:
                out[f"src{int(c.rsplit('#', 1)[1])}"].append(c)
        return {k: sorted(v) for k, v in out.items()}

    dom = Domain("wisc_realestate1", load_datasets, load_labels, partition_by_dataset)
    # attr ids are derivable without materializing the pivot — keep the
    # DataFrame path for loader-parity tests, the cheap path for partitioning
    dom.attrs_by_dataset = _attrs  # type: ignore[method-assign]
    return dom
