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


# --- round-2 completion: remaining makeUniqueKey cases (Graph.fs:373-543) --


def test_bibliographic_key(spark):
    # Graph.fs:449-455: author before first comma, title initials, year
    col = K.bibliographic_key(
        F.lit("Smith, John A."), F.lit("The Holocene Record"), F.lit(1998)
    )
    assert _eval(spark, col) == "sourcenode_pub_smith_thr_1998"


def test_bibliographic_key_all_none(spark):
    col = K.bibliographic_key(
        F.lit(None).cast("string"),
        F.lit(None).cast("string"),
        F.lit(None).cast("int"),
    )
    assert _eval(spark, col) == "sourcenode_pub_unknown_notitle_noyear"


def test_grey_literature_key_unfiltered_initials(spark):
    # Graph.fs:456-460: initials are NOT alnum-filtered (punctuation kept)
    col = K.grey_literature_key(
        F.lit("Jones"), F.lit("Mary Ann"), F.lit("Lake sediment (core) data")
    )
    assert _eval(spark, col) == "sourcenode_grey_jones_ma_ls(d"


def test_dark_data_key(spark):
    # Graph.fs:461: safeString name parts; details initials alnum-filtered
    col = K.dark_data_key(
        F.lit("O'Neil"),
        F.lit("Seán"),
        F.lit("unpublished pollen counts from 12 cores"),
    )
    assert _eval(spark, col) == "sourcenode_darkdata_o39neil_sen_upcf1c"


def test_database_keys(spark):
    assert (
        _eval(spark, K.database_key(F.lit("NEOTOMA;v2")))
        == "sourcenode_database_neotomav2"
    )
    col = K.database_entry_key(F.lit("GBIF"), F.lit("occ/12345"))
    assert _eval(spark, col) == "sourcenode_database_gbif_entry_occ12345"


def test_book_key(spark):
    # Graph.fs:466-472
    col = K.book_key(
        F.lit("Smith"),
        F.array(F.lit("Brown"), F.lit("Lee")),
        F.lit("A Guide to Arctic Pollen"),
        F.lit(1987),
    )
    assert _eval(spark, col) == "sourcenode_book_smith_bl_agtap_1987"


def test_book_key_no_additional_authors_double_underscore(spark):
    # empty additional-author list -> empty segment, as String.concat does
    col = K.book_key(
        F.lit("Smith"),
        F.array().cast("array<string>"),
        F.lit("A Guide to Arctic Pollen"),
        F.lit(1987),
    )
    assert _eval(spark, col) == "sourcenode_book_smith__agtap_1987"


def test_book_chapter_key(spark):
    # Graph.fs:473-479 (last segment = first page)
    col = K.book_chapter_key(
        F.lit("Davis"),
        F.array().cast("array<string>"),
        F.lit("Chapter on diatoms"),
        F.lit(45),
    )
    assert _eval(spark, col) == "sourcenode_book-chapter_davis__cod_45"


def test_published_dataset_key(spark):
    # Graph.fs:480-487
    col = K.published_dataset_key(
        F.array(F.lit("Green"), F.lit("White"), F.lit("Black")),
        F.lit("JR"),
        F.lit(2001),
        F.lit("Pollen Data Set"),
    )
    assert _eval(spark, col) == "sourcenode_published-dataset_green_jr_wb_2001_pds"
    single = K.published_dataset_key(
        F.array(F.lit("Green")), F.lit("JR"), F.lit(2001), F.lit("Pollen Data Set")
    )
    assert (
        _eval(spark, single)
        == "sourcenode_published-dataset_green_jr_single_2001_pds"
    )
    empty = K.published_dataset_key(
        F.array().cast("array<string>"),
        F.lit(None).cast("string"),
        F.lit(None).cast("int"),
        F.lit("Pollen Data Set"),
    )
    assert (
        _eval(spark, empty)
        == "sourcenode_published-dataset_unk_unk_single_unk_pds"
    )


def test_dissertation_key(spark):
    col = K.dissertation_key(
        F.lit("Miller"),
        F.lit("AB"),
        F.lit(2015),
        F.lit("Vegetation history of Svalbard"),
    )
    assert _eval(spark, col) == "sourcenode_dissertation_miller_ab_2015_vhos"


def test_grey_literature_source_key(spark):
    col = K.grey_literature_source_key(
        F.lit("PersonalCommunication"),
        F.array(F.lit("Foo")),
        F.lit("X"),
        F.lit(None).cast("int"),
        F.lit("Some notes"),
    )
    assert (
        _eval(spark, col)
        == "sourcenode_greylit_personalcommunication_foo_x_single_unk_sn"
    )


def test_dark_data_source_key(spark):
    col = K.dark_data_source_key(
        F.lit("Olsen"),
        F.lit("PK"),
        F.array(F.lit("Ruud")),
        F.lit(None).cast("int"),
        F.lit("field measurements archive"),
    )
    assert _eval(spark, col) == "sourcenode_darkdata_olsen_pk_r_unk_fma"


def test_biotic_proxy_keys(spark):
    assert (
        _eval(spark, K.adna_key(F.lit("ITS2-seq")))
        == "bioticproxynode_adna_its2-seq"
    )
    assert (
        _eval(spark, K.direct_key(F.lit("Betula nana")))
        == "bioticproxynode_direct_betula nana"
    )
    # fossil value comes before part (Graph.fs:385-386)
    col = K.megafossil_key(F.lit("Trunk"), F.lit("Pinus stump"))
    assert (
        _eval(spark, col)
        == "bioticproxynode_morphotype_megafossil_pinus stump_trunk"
    )
    col = K.macrofossil_key(F.lit("Seed"), F.lit("Betula fruit"))
    assert (
        _eval(spark, col)
        == "bioticproxynode_morphotype_macrofossil_betula fruit_seed"
    )


def test_microfossil_keys(spark):
    col = K.microfossil_key(F.lit("Diatom"), F.lit("Navicula sp."))
    assert _eval(spark, col) == "bioticproxynode_morphotype_diatom_navicula sp"
    col = K.microfossil_key(F.lit("Chironomid"), F.lit("Head capsule"))
    assert (
        _eval(spark, col)
        == "bioticproxynode_morphotype_customgroup_chironomid_head capsule"
    )


def test_proxy_category_keys(spark):
    assert (
        _eval(spark, K.adna_category_key(F.lit("Plantae")))
        == "bioticproxycategorynode_adna_plantae"
    )
    assert (
        _eval(spark, K.contemporary_category_key(F.lit("Aves")))
        == "bioticproxycategorynode_contemporary_aves"
    )
    assert (
        _eval(spark, K.fossil_category_key(F.lit("Insecta")))
        == "bioticproxycategorynode_fossil_insecta"
    )
    assert (
        _eval(spark, K.microfossil_category_key(F.lit("Pollen")))
        == "bioticproxycategorynode_fossilmicro_pollen"
    )
    assert (
        _eval(spark, K.microfossil_category_key(F.lit("Chironomid")))
        == "bioticproxycategorynode_fossilmicro_other_chironomid"
    )


def test_subspecies_key_html_encode_only_authorship(spark):
    # Graph.fs:424: 4th part HtmlEncoded but not stripped
    col = K.subspecies_key(
        F.lit("Subspecies"),
        F.lit("Betula"),
        F.lit("nana"),
        F.lit("exilis"),
        F.lit("(Sukaczev) Hultén"),
    )
    assert (
        _eval(spark, col)
        == "taxonnode_subspecies_betula_nana_exilis_(sukaczev) hultén"
    )


def test_names_index_key(spark):
    assert (
        _eval(spark, K.names_index_key(F.lit("Betula nana L.")))
        == "taxonomicnamesindexnode_nomenclature-index_betula nana l"
    )


def test_inference_method_keys(spark):
    assert _eval(spark, K.inference_implicit_key()) == "inferencemethodnode_implicit"
    assert (
        _eval(spark, K.inference_atlas_lookup_key(F.lit("Moore & Webb 1978")))
        == "inferencemethodnode_atlas_lookup_mw1"
    )
    assert (
        _eval(spark, K.inference_expert_key(F.lit("Birks"), F.lit("HJB")))
        == "inferencemethodnode_expert_birks_hjb"
    )
    assert (
        _eval(spark, K.inference_nomenclature_key(F.lit("Flora Europaea Vol 2")))
        == "inferencemethodnode_nomenclature_fev2"
    )
    assert (
        _eval(spark, K.inference_terminology_key(F.lit("Faegri and Iversen 1989")))
        == "inferencemethodnode_morphotypeterminology_fai1"
    )
    assert (
        _eval(
            spark,
            K.inference_reference_collection_key(
                F.lit("Oslo Herbarium"), F.lit("University of Oslo")
            ),
        )
        == "inferencemethodnode_referencecollection_oh_uoo"
    )


def test_vernacular_and_out_of_scope_keys(spark):
    assert (
        _eval(spark, K.vernacular_key(F.lit("en-GB"), F.lit("Dwarf birch")))
        == "vernaculartaxonlabelnode_en-gb_dwarf birch"
    )
    assert (
        _eval(spark, K.out_of_scope_key(F.lit("Pleistocene"), F.lit("ICS")))
        == "qualitativelabeloutofscopenode_pleistocene_by_ics"
    )


def test_outcome_custom_key(spark):
    assert (
        _eval(spark, K.outcome_custom_key(F.lit("Functional diversity")))
        == "biodiversitydimensionnode_custom_functional diversity"
    )


def test_guid_keyed_type_names():
    # Graph.fs:217-247 NodeType() strings for the GUID-keyed arms
    assert K.GUID_KEYED_TYPES == (
        "ProxiedTaxonNode",
        "ContextNode",
        "IndividualTimelineNode",
        "IndividualDateNode",
        "DateCalibrationInstanceNode",
        "DigitisedDatasetNode",
    )
