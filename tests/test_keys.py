"""Key-scheme goldens (X3, Graph.fs:373-543): expected strings derived by
hand-executing the reference's pipeline (safeString = HtmlEncode + strip
[^aA-zZ_ \\-+0-9]; toLower; initials)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from biodiversity_graph_db_spark.functions import keys as K


def _eval(spark, col) -> str:
    return spark.range(1).select(col.alias("v")).first().v


@pytest.mark.parametrize(
    "text,expected",
    [
        ("Betula nana L.", "Betula nana L"),        # '.' stripped
        ("Salix & co", "Salix amp co"),             # & -> &amp; -> 'amp' kept
        ("høj", "hj"),                              # non-ascii letter stripped
        ("a_b-c+d 9", "a_b-c+d 9"),                 # allowed set intact
        ('x"y', "xquoty"),                          # " -> &quot;
    ],
)
def test_safe_string(spark, text, expected):
    assert _eval(spark, K.safe_string(F.lit(text))) == expected


@pytest.mark.parametrize(
    "text,expected",
    [
        ("The Quick Brown Fox", "TQBF"),
        ("of arctic  pollen", "oap"),   # double space -> empty word skipped
        ("(quoted) words", "w"),        # '(' not alphanumeric -> dropped
        ("a 1 b", "a1b"),
    ],
)
def test_initials(spark, text, expected):
    assert _eval(spark, K.take_alphanum_first_chars(F.lit(text))) == expected


def test_year_key(spark):
    # Graph.fs:527 "{n}ybp"
    assert _eval(spark, K.year_key(F.lit(11650))) == "calyearnode_11650ybp"
    assert _eval(spark, K.year_key(F.lit(-72))) == "calyearnode_-72ybp"


def test_species_key(spark):
    # Graph.fs:421 species_{genus}_{species}_{auth}
    col = K.taxon_key(
        F.lit("Species"), F.lit("Betula"), F.lit("nana"), F.lit("L.")
    )
    assert _eval(spark, col) == "taxonnode_species_betula_nana_l"


def test_life_key(spark):
    assert _eval(spark, K.taxon_key(F.lit("Life"))) == "taxonnode_life"


def test_journal_article_key(spark):
    # Graph.fs:502-507 pub_{lastname}_{title-initials}_{year}
    col = K.journal_article_key(
        F.lit("Smith"),
        F.lit("The Holocene Pollen Record of Northern Svalbard"),
        F.lit(1998),
    )
    assert _eval(spark, col) == "sourcenode_pub_smith_thprons_1998"


def test_outcome_keys(spark):
    # Graph.fs:534-543
    cases = {
        "Abundance": "biodiversitydimensionnode_abundance",
        "DiversityBeta": "biodiversitydimensionnode_beta_diversity",
        "PresenceOnly": "biodiversitydimensionnode_presence",
        "PresenceAbsence": "biodiversitydimensionnode_presence_absence",
        "Richness": "biodiversitydimensionnode_richness",
    }
    for measure, expected in cases.items():
        assert _eval(spark, K.outcome_key(F.lit(measure))) == expected


def test_slice_label_key(spark):
    # Graph.fs:528 "{name}_by_{authority}" (spaces survive safeString)
    col = K.slice_label_key(
        F.lit("Holocene"), F.lit("Global Stratotype Section and Point")
    )
    assert (
        _eval(spark, col)
        == "qualitativelabelnode_holocene_by_global stratotype section and point"
    )


def test_morphotype_key(spark):
    col = K.morphotype_key(F.lit("Pollen"), F.lit("Betula (type A)"))
    assert _eval(spark, col) == "bioticproxynode_morphotype_pollen_betula type a"


def test_uuid_key_shape(spark):
    v = _eval(spark, K.uuid_key("ProxiedTaxonNode"))
    assert v.startswith("proxiedtaxonnode_") and len(v.split("_", 1)[1]) == 36
