"""Domain eval utils — DataPartitioner parity + the per-domain trait analogs.

Reference: matcher/.../matcher/eval/DataPartitioner.scala (both strategies),
matcher/.../matcher/eval/datasetutils/*.scala (per-domain loaders/labels/
partition wiring).
"""

from __future__ import annotations

import random

from serene_spark.operators.domain_eval import (
    ausgov_toilets_domain,
    partition_by_attribute,
    partition_by_dataset,
    usgov_carparking_domain,
    wisc_realestate1_domain,
)


def _toy_attrs():
    return {
        "ds1": [f"a{i}@t@ds1" for i in range(10)],
        "ds2": [f"b{i}@t@ds2" for i in range(10)],
    }


def _toy_labels():
    # three positive sets spanning both datasets
    return [
        {"a0@t@ds1", "b0@t@ds2"},
        {"a1@t@ds1", "b1@t@ds2"},
        {"a2@t@ds1", "b2@t@ds2", "a3@t@ds1"},
    ]


class TestPartitionByAttribute:
    def test_label_attrs_follow_their_split(self):
        (tr_attrs, tr_labels), (te_attrs, te_labels) = partition_by_attribute(
            _toy_attrs(), _toy_labels(), prop_train=0.66, seed=1000
        )
        # floor(0.66*3)=1 train label set, 2 test sets (DataPartitioner.scala:30-33)
        assert len(tr_labels) == 1 and len(te_labels) == 2
        tr_flat = {a for ds in tr_attrs.values() for a in ds}
        te_flat = {a for ds in te_attrs.values() for a in ds}
        for s in tr_labels:
            assert s <= tr_flat
        for s in te_labels:
            assert s <= te_flat
        # partition property: disjoint, exhaustive
        assert tr_flat.isdisjoint(te_flat)
        assert tr_flat | te_flat == {a for ds in _toy_attrs().values() for a in ds}

    def test_deterministic_for_seed(self):
        one = partition_by_attribute(_toy_attrs(), _toy_labels(), 0.5, seed=7)
        two = partition_by_attribute(_toy_attrs(), _toy_labels(), 0.5, seed=7)
        assert one == two
        other = partition_by_attribute(_toy_attrs(), _toy_labels(), 0.5, seed=8)
        assert one != other  # same data, different seed → different draw

    def test_proportion_roughly_holds_per_dataset(self):
        attrs = {f"ds{d}": [f"c{d}_{i}" for i in range(200)] for d in range(3)}
        (tr, _), (_te, _) = partition_by_attribute(attrs, [], 0.7, seed=1000)
        for ds, cols in tr.items():
            assert 0.55 < len(cols) / 200 < 0.85, (ds, len(cols))


class TestPartitionByDataset:
    def test_whole_datasets_move_together(self):
        (tr_attrs, _), (te_attrs, _) = partition_by_dataset(
            _toy_attrs(), _toy_labels(), prop_train=0.5, seed=1000
        )
        # floor(0.5*2)=1 dataset each side, intact
        assert len(tr_attrs) == 1 and len(te_attrs) == 1
        for ds, cols in {**tr_attrs, **te_attrs}.items():
            assert cols == _toy_attrs()[ds]

    def test_singleton_label_sets_dropped(self):
        # every toy label set spans both datasets, so splitting 1/1 reduces
        # each to a singleton on the 2-element sets → dropped; the 3-element
        # set keeps 2 attrs on ds1's side → kept iff ds1 is on that side
        (tr_attrs, tr_labels), (te_attrs, te_labels) = partition_by_dataset(
            _toy_attrs(), _toy_labels(), 0.5, seed=1000
        )
        surviving = tr_labels + te_labels
        assert surviving == [{"a2@t@ds1", "a3@t@ds1"}]
        side = tr_labels if "ds1" in tr_attrs else te_labels
        assert side == surviving  # it sits on ds1's side


class TestCsvDirDomains:
    def test_ausgov_toilets_loads_and_partitions(self, spark, tmp_path):
        dom = ausgov_toilets_domain(str(tmp_path))
        dfs = dom.load_datasets(spark)
        assert set(dfs) == {"NSW", "VIC", "QLD", "WA"}
        # lineage ids column@table@dataset (CsvDataLoader.scala:98-102)
        assert "name@NSW@AU" in dfs["NSW"].columns
        assert dfs["NSW"].count() == 40
        pos, ambig = dom.load_labels()
        assert len(pos) == 7 and ambig == []  # 7 shared classes
        all_label_attrs = set().union(*pos)
        all_attrs = {a for df in dfs.values() for a in df.columns}
        assert all_label_attrs <= all_attrs
        (tr, trl), (te, tel) = dom.partition(spark, 0.66, seed=1000)
        assert len(trl) == 4 and len(tel) == 3  # floor(0.66*7)=4
        tr_flat = {a for ds in tr.values() for a in ds}
        for s in trl:
            assert s <= tr_flat

    def test_usgov_carparking_loads(self, spark, tmp_path):
        dom = usgov_carparking_domain(str(tmp_path))
        dfs = dom.load_datasets(spark)
        assert set(dfs) == {"dc", "seattle", "chicago"}
        assert dfs["dc"].count() == 30
        pos, _ = dom.load_labels()
        assert len(pos) == 5
        # rate class spans all three city schemas under different names
        rate = next(s for s in pos if "rate@dc@US" in s)
        assert rate == {"rate@dc@US", "hourly_rate@seattle@US", "price_per_hour@chicago@US"}


class TestWiscRealEstateDomain:
    def test_partition_by_dataset_keeps_cross_source_sets(self, spark):
        dom = wisc_realestate1_domain(n_sources=5)
        (tr, trl), (te, tel) = dom.partition(spark, 0.6, seed=1000)
        # floor(0.6*5)=3 train sources, 2 test
        assert len(tr) == 3 and len(te) == 2
        # every class spans 5 sources → 3 survive train side, 2 survive test
        assert len(trl) == 16 and len(tel) == 16
        for s in trl:
            assert len(s) == 3
        for s in tel:
            assert len(s) == 2

    def test_load_datasets_rebuilds_wide_sources(self, spark):
        dom = wisc_realestate1_domain(n_sources=2)
        dfs = dom.load_datasets(spark)
        assert set(dfs) == {"src0", "src1"}
        w = dfs["src0"]
        assert len(w.columns) == 19  # 16 classes + 3 unknown columns
        assert w.count() == 150
        # a price column exists and looks like currency
        price_col = next(c for c in w.columns if "price" in c)
        val = w.select(price_col).first()[0]
        assert val.startswith("$")

    def test_labels_match_generated_columns(self, spark):
        dom = wisc_realestate1_domain(n_sources=3)
        pos, ambig = dom.load_labels()
        attrs = {a for cols in dom.attrs_by_dataset(spark).values() for a in cols}
        for s in pos:
            assert s <= attrs
        assert len(ambig) == 1
