"""PCORnet CDM configuration: cohort subsetting over VARCHAR patid keys.

The reference's ``subset_pcornet_by_cohort`` builds a target schema where
every PCORnet table is reduced to the cohort (reference:
pedsnetdcc/subset_pcornet_by_cohort.py:186-303):

- most tables join the cohort on ``patid`` (the ``select_patid`` set,
  :187-209);
- ``provider`` and ``harvest`` are copied whole (``select_all``, :212-215);
- special handling (:262-275): ``lab_history`` keeps rows whose
  ``lab_loinc`` appears in the subsetted ``lab_result_cm``;
  ``private_address_geocode`` keeps rows whose ``addressid`` appears in
  the subsetted ``lds_address_history``; ``hash_token`` joins the cohort
  on patid only when ``--inchash`` is given, else is created EMPTY
  (``where FALSE``).

PCORnet ids are VARCHAR (reference id_mapping_transform.py:193-196), so
the cohort key is a string column — the semi joins below are
type-agnostic.

Scale: the cohort and the derived key lists (distinct lab_loinc /
addressid of already-subsetted tables) are small versus the fact tables,
so every probe is a broadcast left-semi join — no fact-table shuffle
anywhere in the subset (same shape as ``subset_by_cohort``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pedsnetdcc_spark.operators.cohort import subset_by_cohort

# subset_pcornet_by_cohort.py:187-209
PCORNET_SELECT_PATID = frozenset(
    {
        "demographic",
        "enrollment",
        "encounter",
        "diagnosis",
        "procedures",
        "vital",
        "dispensing",
        "lab_result_cm",
        "condition",
        "pro_cm",
        "prescribing",
        "pcornet_trial",
        "provider",
        "harvest",
        "death",
        "death_cause",
        "med_admin",
        "obs_clin",
        "obs_gen",
        "lds_address_history",
        "immunization",
        "private_demographic",
        "private_address_history",
    }
)

# subset_pcornet_by_cohort.py:212-215 — copied whole, no cohort join
PCORNET_SELECT_ALL = frozenset({"provider", "harvest"})

# subset_pcornet_by_cohort.py:217-221,262-275
PCORNET_SPECIAL = frozenset({"lab_history", "private_address_geocode", "hash_token"})


def subset_pcornet(
    tables: dict[str, DataFrame],
    cohort: DataFrame,
    patid_col: str = "patid",
    inc_hash: bool = False,
) -> dict[str, DataFrame]:
    """Subset a PCORnet namespace to a patid cohort.

    ``tables`` maps PCORnet table names to DataFrames; only present
    tables are processed (the reference enumerates a fixed schema; a
    missing table there is an error, here a no-op so partial namespaces
    work).  Returns the subsetted namespace, one DataFrame per input
    table, preserving each table's full column set (``select t.*``).
    """
    out: dict[str, DataFrame] = {}
    for name in sorted(PCORNET_SELECT_PATID & tables.keys()):
        df = tables[name]
        if name in PCORNET_SELECT_ALL:
            out[name] = df
        else:
            out[name] = subset_by_cohort(df, cohort, patid_col)

    if "lab_history" in tables:
        lab = out.get("lab_result_cm")
        if lab is None:
            raise ValueError("lab_history needs lab_result_cm in the namespace")
        out["lab_history"] = subset_by_cohort(
            tables["lab_history"], lab, "lab_loinc"
        )
    if "private_address_geocode" in tables:
        addr = out.get("lds_address_history")
        if addr is None:
            raise ValueError(
                "private_address_geocode needs lds_address_history in the namespace"
            )
        out["private_address_geocode"] = subset_by_cohort(
            tables["private_address_geocode"], addr, "addressid"
        )
    if "hash_token" in tables:
        ht = tables["hash_token"]
        if inc_hash:
            out["hash_token"] = subset_by_cohort(ht, cohort, patid_col)
        else:  # created empty: 'where FALSE' (:269-272)
            out["hash_token"] = ht.filter(F.lit(False))
    return out
