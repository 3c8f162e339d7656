"""Feature-config JSON gating (SURVEY §2.12) — the reference's user-facing
operator-selection language.

Mirrors ``FeatureSettings`` (matcher/.../features/FeatureSettings.scala:9-60):
a JSON document with ``activeFeatures`` (scalar features, §2.3),
``activeFeatureGroups`` (vector feature groups, §2.4-2.5) and
``featureExtractorParams`` (list of ``{"name": ..., param: value}`` maps).
Feature names are the reference's documented config names
(matcher/dirstruct/semantic_type_classifier/repo/docs/features.txt).

Gating is applied in ``profile_features_from_long``: only the aggregations a
config needs are computed/joined, and the feature matrix carries exactly the
gated columns — so a model trained under a config uses those features and
nothing else (the VectorAssembler records them).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

# config name (features.txt) -> columns in the profiling feature matrix
SCALAR_FEATURE_COLUMNS: dict[str, list[str]] = {
    "num-unique-vals": ["num_unique_vals"],
    "prop-unique-vals": ["prop_unique_vals"],
    "prop-missing-vals": ["prop_missing_vals"],
    "ratio-alpha-chars": ["ratio_alpha_chars"],
    "prop-entries-with-at-sign": ["prop_entries_with_at_sign"],
    "prop-entries-with-currency-symbol": ["prop_entries_with_currency_symbol"],
    "prop-entries-with-hyphen": ["prop_entries_with_hyphen"],
    "prop-entries-with-paren": ["prop_entries_with_paren"],
    "mean-commas-per-entry": ["mean_commas_per_entry"],
    "mean-forward-slashes-per-entry": ["mean_forward_slashes_per_entry"],
    "prop-range-format": ["prop_range_format"],
    "prop-numerical-chars": ["prop_numerical_chars"],
    "prop-whitespace-chars": ["prop_whitespace_chars"],
    "is-discrete": ["is_discrete"],
    "entropy-for-discrete-values": ["entropy_for_discrete_values"],
    "prop-datepattern": ["prop_datepattern"],
    "shannon-entropy": ["shannon_char_entropy"],
}

GROUP_FEATURE_COLUMNS: dict[str, list[str]] = {
    "stats-of-text-length": ["mean_len", "median_len", "mode_len", "min_len", "max_len"],
    "stats-of-numerical-type": ["mean_num", "median_num", "min_num", "max_num"],
}

ALL_FEATURES = frozenset(SCALAR_FEATURE_COLUMNS)
ALL_GROUPS = frozenset(GROUP_FEATURE_COLUMNS)


@dataclass(frozen=True)
class FeatureSettings:
    """Parsed feature config (FeatureSettings.scala:57-62)."""

    active_features: frozenset[str] = ALL_FEATURES
    active_feature_groups: frozenset[str] = ALL_GROUPS
    feature_extractor_params: dict[str, dict[str, str]] = field(default_factory=dict)

    def __post_init__(self) -> None:
        bad = (set(self.active_features) - ALL_FEATURES) | (
            set(self.active_feature_groups) - ALL_GROUPS
        )
        if bad:
            raise ValueError(
                f"unknown feature name(s) {sorted(bad)}; valid scalar features: "
                f"{sorted(ALL_FEATURES)}; valid groups: {sorted(ALL_GROUPS)}"
            )

    @classmethod
    def from_json(cls, text: str) -> FeatureSettings:
        d = json.loads(text)
        params_list = d.get("featureExtractorParams", [])
        params = {p["name"]: dict(p) for p in params_list}
        return cls(
            active_features=frozenset(d.get("activeFeatures", [])),
            active_feature_groups=frozenset(d.get("activeFeatureGroups", [])),
            feature_extractor_params=params,
        )

    @classmethod
    def load(cls, path: str) -> FeatureSettings:
        with open(path) as f:
            return cls.from_json(f.read())

    def matrix_columns(self) -> list[str]:
        """Gated feature-matrix columns, in canonical (registry) order."""
        cols: list[str] = []
        for name, cc in SCALAR_FEATURE_COLUMNS.items():
            if name in self.active_features:
                cols += cc
        for name, cc in GROUP_FEATURE_COLUMNS.items():
            if name in self.active_feature_groups:
                cols += cc
        return cols

    @property
    def needs_textlen(self) -> bool:
        return "stats-of-text-length" in self.active_feature_groups

    @property
    def needs_numeric(self) -> bool:
        return "stats-of-numerical-type" in self.active_feature_groups

    @property
    def needs_char_entropy(self) -> bool:
        return "shannon-entropy" in self.active_features
