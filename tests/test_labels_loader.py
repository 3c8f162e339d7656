"""Labels loaders (LabelsLoader.scala:9-75 semantics)."""

from __future__ import annotations

from serene_spark.sources.labels_loader import (
    find_label,
    labels_df,
    load_pos_and_ambig,
    load_positive_only,
    load_semantic_type_labels,
)


def _write(p, text):
    p.write_text(text, encoding="utf-8")
    return str(p)


def test_manual_and_predicted_rows(tmp_path):
    f = _write(
        tmp_path / "labels.csv",
        "attr_id,class\n"
        "name@customer@corp,person_name\n"
        "addr@customer@corp,address\n"
        # 6-col predicted: unvalidated "?" must be skipped
        "phone@customer@corp,phone,0.91,2016-01-01,?,2016-01-02\n"
        # validated prediction: actual class (field 5) wins
        "email@customer@corp,addr,0.77,2016-01-01,email,2016-01-02\n"
        "garbage-line-with,three,fields\n",
    )
    labels = load_semantic_type_labels(f)
    assert find_label(labels, "name@customer@corp") == "person_name"
    assert find_label(labels, "email@customer@corp") == "email"
    assert labels["email@customer@corp"].label_type == "predicted"
    assert labels["email@customer@corp"].confidence == 0.77
    # skipped unvalidated + missing id -> reserved unknown class
    assert find_label(labels, "phone@customer@corp") == "unknown"
    assert find_label(labels, "never-seen") == "unknown"
    assert "garbage-line-with" not in labels


def test_recursive_dir_dotfile_exclusion_and_override(tmp_path):
    (tmp_path / "sub").mkdir()
    (tmp_path / ".hidden").mkdir()
    _write(tmp_path / "a.csv", "attr_id,class\nx@t@d,first\ny@t@d,keep\n")
    _write(tmp_path / "sub" / "b.csv", "attr_id,class\nx@t@d,second\n")
    _write(tmp_path / ".skipme.csv", "attr_id,class\nx@t@d,dotfile\n")
    _write(tmp_path / ".hidden" / "c.csv", "attr_id,class\nz@t@d,hidden\n")
    labels = load_semantic_type_labels(str(tmp_path))
    # later (lexicographically deeper) file wins; dot-files never read
    assert labels["x@t@d"].cls == "second"
    assert labels["y@t@d"].cls == "keep"
    assert "z@t@d" not in labels


def test_labels_df_column_name_derivation(spark, tmp_path):
    f = _write(
        tmp_path / "labels.csv",
        "attr_id,class\nc_name@customer@tpch,person_name\nc_acctbal@customer@tpch,balance\n",
    )
    df = labels_df(spark, f)
    got = {r["column_name"]: r["class"] for r in df.collect()}
    assert got == {"c_name": "person_name", "c_acctbal": "balance"}


def test_positive_only_and_ambig(tmp_path):
    pos = _write(tmp_path / "pos.txt", "# comment\na@1,b@1\n\nc@2,d@2,e@2\n")
    ambig = _write(tmp_path / "ambig.txt", "((a@1,b@1),(c@2,d@2))\nnot-a-pair\n")
    pos_sets, ambig_pairs = load_pos_and_ambig(pos, ambig)
    assert pos_sets == [{"a@1", "b@1"}, {"c@2", "d@2", "e@2"}]
    assert ambig_pairs[0] == ({"a@1", "b@1"}, {"c@2", "d@2"})
    assert ambig_pairs[1] == (set(), set())
    assert load_positive_only(pos) == pos_sets
