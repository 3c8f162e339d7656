"""Column-name tokenizer tests (SURVEY §2.7; StringTokenizer.scala:35-78)."""

from serene_spark.functions.tokenize import tokenize_name


def test_camel_case_split():
    assert tokenize_name("firstName") == ["first", "name"]
    assert tokenize_name("homePhoneNumber") == ["home", "phone", "number"]


def test_non_alnum_split_and_lowercase():
    assert tokenize_name("c_acctbal") == ["c", "acct", "bal"]
    assert tokenize_name("o_order-date") == ["o", "order", "date"]


def test_compound_split():
    assert tokenize_name("custname") == ["cust", "name"]
    assert tokenize_name("shipdate") == ["ship", "date"]
    assert tokenize_name("mktsegment") == ["mkt", "segment"]


def test_unknown_word_stays_whole():
    assert tokenize_name("qzxv") == ["qzxv"]
    assert tokenize_name("linenumber") == ["line", "number"]


def test_minimum_cut_prefers_fewest_segments():
    # "telephone" is itself a word — must not split into tel+e+phone etc.
    assert tokenize_name("telephone") == ["telephone"]


def test_digits_and_empty():
    assert tokenize_name("") == []
    assert tokenize_name("col12") == ["col12"] or tokenize_name("col12") == ["col", "12"]
