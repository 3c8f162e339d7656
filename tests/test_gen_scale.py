"""tools/gen_scale.py guard: the scale generator must stay schema- and
key-relationship-compatible with the driver's testdata, or every sf1+
scaling number silently measures a different workload."""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


@pytest.fixture(scope="module")
def gen_dir(tmp_path_factory):
    import sys

    sys.path.insert(0, "/root/repo")
    from tools.gen_scale import gen

    out = str(tmp_path_factory.mktemp("gen") / "sf0.001")
    gen(0.001, out)
    return out


def test_schemas_match_driver_testdata(gen_dir):
    for t in TABLES:
        ref = pq.ParquetFile(f"/root/testdata/sf0.001/{t}.parquet").schema_arrow
        got = pq.ParquetFile(f"{gen_dir}/{t}.parquet").schema_arrow
        assert [(f.name, str(f.type)) for f in got] == \
               [(f.name, str(f.type)) for f in ref], t


def test_row_counts_scale_with_sf(gen_dir):
    import pandas as pd

    li = pq.ParquetFile(f"{gen_dir}/lineitem.parquet").metadata.num_rows
    od = pq.ParquetFile(f"{gen_dir}/orders.parquet").metadata.num_rows
    assert li == 6000 and od == 1500
    # foreign keys resolve
    l = pd.read_parquet(f"{gen_dir}/lineitem.parquet")
    o = pd.read_parquet(f"{gen_dir}/orders.parquet")
    p = pd.read_parquet(f"{gen_dir}/part.parquet")
    assert l.l_orderkey.isin(o.o_orderkey).all()
    assert l.l_partkey.isin(p.p_partkey).all()
    # shipdate follows the order date (the q1/q3 predicate shape)
    m = l.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    assert (m.l_shipdate > m.o_orderdate).all()


def test_documents_have_dup_structure(tmp_path):
    import pandas as pd

    from tools.gen_scale import gen

    # sf0.01 (500 docs): large enough for the seeded ~0.3% exact-dup rate
    # to materialize deterministically (5 groups with this seed)
    out = str(tmp_path / "sf0.01")
    gen(0.01, out)
    d = pd.read_parquet(f"{out}/documents.parquet")
    norm = d.text.str.lower().str.replace(r"\s+", " ", regex=True).str.strip()
    vc = norm.value_counts()
    # exact dups injected (~0.3%) and near-dup copies (~5%) — the LSH
    # pipeline needs true pairs to verify at every scale
    assert (vc > 1).sum() >= 3
    assert (d.n_chars == d.text.str.len()).all()
