"""profile_diff / restrict_profile / profile_impact — the rule-author's
"what does this change break?" surface. The load-bearing check is the
restricted-equals-full identity: the impact computed from RESTRICTED
validation runs (only impacted rules) must equal the brute-force multiset
diff of two FULL validation runs."""

import pandas as pd
import pytest

from fhir_data_validation_ray.pipelines.profiles import (
    default_profile,
    profile_diff,
    restrict_profile,
)

SF = "/root/testdata/sf0.001"
KEY = ["doc_id", "span_index", "rule_id", "error_code", "severity"]


# ---------------------------------------------------------------- pure diff
def test_diff_added_removed_changed():
    old = default_profile()
    new = default_profile()
    new["rules"] = [r for r in new["rules"] if r["id"] != "R4"]
    for r in new["rules"]:
        if r["id"] == "R3":
            r["params"]["values"] = ["final"]
        if r["id"] == "R1":
            r["severity"] = "warning"
    new["rules"].append({"id": "R99", "type": "Required", "kind": "Coding",
                         "fieldPath": "text"})
    d = profile_diff(old, new)
    assert d["added"] == ["R99"] and d["removed"] == ["R4"]
    assert {c["id"]: c["fields"] for c in d["changed"]} == {
        "R1": ["severity"], "R3": ["params"]}
    assert d["settings_changed"] == [] and d["code_systems_changed"] == []
    assert d["impacted_old"] == ["R1", "R3", "R4"]
    assert d["impacted_new"] == ["R1", "R3", "R99"]


def test_diff_codesystem_change_impacts_referencing_rule():
    old = default_profile()
    new = default_profile()
    new["codeSystems"][0]["concept"].append({"code": "ZH"})
    d = profile_diff(old, new)
    assert d["code_systems_changed"] == ["https://example.org/cs/language"]
    # R6 is the CodeSystem rule bound to that url — impacted on BOTH sides
    assert d["impacted_old"] == ["R6"] and d["impacted_new"] == ["R6"]
    assert d["added"] == d["removed"] == d["changed"] == []


def test_diff_settings_change_flagged():
    old = default_profile()
    new = default_profile()
    new["settings"]["checkEmptyDoc"] = False
    d = profile_diff(old, new)
    assert d["settings_changed"] == ["settings"]


def test_restrict_profile_keeps_catalogs():
    p = restrict_profile(default_profile(), {"R6"})
    assert [r["id"] for r in p["rules"]] == ["R6"]
    assert p["codeSystems"] and p["settings"] == default_profile()["settings"]


# ------------------------------------------------------- brute-force helper
def _brute_diff(old_obj, new_obj, rule_ids_old, rule_ids_new):
    from fhir_data_validation_ray.pipelines.validate import run_validation

    def counts(profile, ids):
        df = run_validation(SF, profile, with_uniqueness=False).to_pandas()
        if ids is not None:
            df = df[df["rule_id"].isin(ids)]
        return (df.groupby(KEY).size().rename("n").reset_index()
                if len(df) else pd.DataFrame(columns=KEY + ["n"]))

    b = counts(old_obj, rule_ids_old).rename(columns={"n": "n_before"})
    a = counts(new_obj, rule_ids_new).rename(columns={"n": "n_after"})
    m = b.merge(a, on=KEY, how="outer").fillna(0)
    m["n_before"] = m["n_before"].astype("int64")
    m["n_after"] = m["n_after"].astype("int64")
    m = m[m["n_before"] != m["n_after"]].copy()
    m["change"] = (m["n_after"] > m["n_before"]).map(
        {True: "introduced", False: "resolved"})
    return m.sort_values(KEY).reset_index(drop=True)


def _impact_df(old_obj, new_obj):
    from fhir_data_validation_ray.pipelines.validate import profile_impact

    got = profile_impact(SF, old_obj, new_obj).to_pandas()
    if len(got) == 0:
        return got
    return got.sort_values(KEY).reset_index(drop=True)


def _assert_same(got, want):
    cols = ["change"] + KEY + ["n_before", "n_after"]
    got, want = got[cols], want[cols]
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True),
        check_dtype=False)


# ------------------------------------------------ restricted == full (Ray)
def test_impact_restricted_equals_full(ray_session):
    from fhir_data_validation_ray.pipelines.queries import _impact_new_profile

    old, new = default_profile(), _impact_new_profile()
    d = profile_diff(old, new)
    want = _brute_diff(old, new, set(d["impacted_old"]),
                       set(d["impacted_new"]))
    got = _impact_df(old, new)
    assert len(got) > 0  # the scenario resolves AND introduces rows
    assert set(got["change"]) == {"introduced", "resolved"}
    _assert_same(got, want)


def test_impact_identical_profiles_is_empty(ray_session):
    got = _impact_df(default_profile(), default_profile())
    assert len(got) == 0


def test_impact_structural_change_full_run_diff(ray_session):
    """settings change -> full-run fallback; disabling checkEmptyDoc
    resolves exactly the EMPTY_BUNDLE rows."""
    old = default_profile()
    new = default_profile()
    new["settings"]["checkEmptyDoc"] = False
    got = _impact_df(old, new)
    want = _brute_diff(old, new, None, None)
    assert len(got) > 0
    assert set(got["change"]) == {"resolved"}
    assert set(got["error_code"]) == {"EMPTY_BUNDLE"}
    _assert_same(got, want)


def test_impact_severity_change_swaps_rows(ray_session):
    """Changing only a rule's severity re-keys its rows: every old row
    resolved, every new row introduced, pairwise at the same spans."""
    old = default_profile()
    new = default_profile()
    for r in new["rules"]:
        if r["id"] == "R1":
            r["severity"] = "warning"
    got = _impact_df(old, new)
    want = _brute_diff(old, new, {"R1"}, {"R1"})
    assert len(got) > 0 and len(got) % 2 == 0
    _assert_same(got, want)
    by_change = got.groupby("change")["severity"].unique().to_dict()
    assert list(by_change["resolved"]) == ["error"]
    assert list(by_change["introduced"]) == ["warning"]


def test_impact_additive_only_and_subtractive_only(ray_session):
    """A change that ONLY adds (or only removes) a rule leaves one side's
    impacted set empty — the empty-value-set filter must not crash
    (null-typed value_set regression) and the diff is one-sided."""
    old = default_profile()
    add_only = default_profile()
    add_only["rules"].append({"id": "R90", "type": "Required",
                              "kind": "Observation",
                              "instanceScope": {"kind": "all"},
                              "fieldPath": "text", "severity": "error"})
    got = _impact_df(old, add_only)
    want = _brute_diff(old, add_only, set(), {"R90"})
    assert len(got) > 0 and set(got["change"]) == {"introduced"}
    _assert_same(got, want)

    remove_only = default_profile()
    remove_only["rules"] = [r for r in remove_only["rules"]
                            if r["id"] != "R4"]
    got = _impact_df(old, remove_only)
    want = _brute_diff(old, remove_only, {"R4"}, set())
    assert len(got) > 0 and set(got["change"]) == {"resolved"}
    _assert_same(got, want)
