"""Snowball stemmers (de/da/no/sv) + LanguageAnalyzer — differential vs the
reference's NLTK-derived ports, word-for-word."""

import random

import pytest

from tests.conftest import HAVE_REFERENCE
from whoosh_novo_ray.analysis import language_analyzer
from whoosh_novo_ray.lang_snowball import STEMMERS, stemmer_for_language

_ALPH = {
    "ru": "абвгдежзийклмнопрстуфхцчшщъыьэюя",
    "fi": "aeiouyäöbcdfghjklmnprstv",
    "ro": "aeiouăâîbcdfghjlmnprstţşvz",
    "hu": "aeiouöüáéíóõúûbcdfghjklmnprstvzy",
    "it": "aeiouàèìòùáéíóúbcdfghjlmnpqrstvz",
    "pt": "aeiouáéíóúâêôãõçbcdfghjlmnpqrstvz",
    "fr": "aeiouyâàëéêèïîôûùbcçdfghjlmnpqrstvxz",
    "es": "aeiouáéíóúübcdfghjlmnpqrstvyz",
    "nl": "aeiouyèäëéíïöóüúbcdfghjklmnprstz",
    "de": "aeiouyäöüßbcdfghklmnrstz",
    "da": "aeiouyæåøbcdfghjklmnprstv",
    "no": "aeiouyæåøbcdfghjklmnprstv",
    "sv": "aeiouyäåöbcdfghjklmnprstv",
}
_SUFS = {
    "ru": ["вшись", "вши", "в", "ся", "сь", "ее", "ими", "его", "ему",
           "ых", "ого", "ют", "ла", "на", "ете", "йте", "ли", "й",
           "л", "ем", "н", "ло", "но", "ет", "ны", "ть", "ешь", "нно",
           "ами", "ями", "ах", "ях", "ости", "ость", "ейш", "нн",
           "и", "ь", "а", "я", "ом", "ой", "ам", "ы", "у", "ов"],
    "fi": ["kaan", "sti", "kin", "nsa", "mme", "si", "ni", "an", "en",
           "siin", "seen", "han", "den", "tta", "ssa", "lla", "lle",
           "ksi", "ta", "na", "a", "n", "impi", "mma", "eja", "kse",
           "ie", "aa", "kk", "tt", "t", "i", "jo"],
    "ro": ["ului", "elor", "aţie", "ele", "ea", "ii", "abilitate",
           "icitate", "ativ", "ator", "itor", "abil", "ibil", "iune",
           "ism", "at", "ut", "it", "ic", "os", "iv", "ează", "ind",
           "are", "ere", "ire", "aţi", "âţi", "sei", "ez", "se",
           "ie", "a", "e", "i", "ă"],
    "hu": ["képpen", "onként", "ként", "ban", "nak", "val", "tól",
           "ról", "hoz", "nál", "ért", "ba", "ra", "ig", "at", "ul",
           "vá", "en", "n", "t", "án", "én", "astul", "stul", "á",
           "é", "oké", "ké", "éi", "ájuk", "unk", "juk", "nk", "em",
           "ja", "ám", "m", "d", "a", "e", "jaitok", "aim", "jai",
           "ik", "i", "ák", "ék", "ok", "k", "al", "el", "bbal",
           "ttel", "ssz", "ggy"],
    "it": ["gliela", "sene", "gli", "ci", "la", "atrice", "azione",
           "uzione", "amento", "amente", "mente", "logia", "enza", "ità",
           "ivo", "erebbero", "assero", "iscono", "ando", "endo", "iamo",
           "ano", "are", "ire", "ar", "ir", "i", "a", "e", "o", "qu",
           "ch", "gh"],
    "pt": ["amentos", "aço~es".replace("~",""), "ações", "logías", "ências", "amente",
           "idade", "ável", "ível", "ira", "iras", "aríamos", "ássemos",
           "assem", "arão", "ando", "endo", "indo", "ados", "ia", "ei",
           "ar", "er", "ir", "eu", "iu", "ou", "os", "a", "i", "o",
           "gu", "ci", "e", "é", "ê", "ç", "eira"],
    "fr": ["issements", "atrice", "ations", "logies", "usions", "ements",
           "amment", "emment", "iqUes".lower(), "euses", "ance", "ence",
           "ités", "ives", "eaux", "ment", "eux", "ité", "if", "issaient",
           "irions", "ies", "ira", "ie", "ir", "is", "it", "i", "eraient",
           "assions", "ions", "ées", "era", "iez", "ais", "ant", "ée",
           "és", "er", "ez", "ât", "ai", "as", "é", "a", "ière", "ion",
           "ier", "e", "ë", "qu", "gu", "enn", "ett", "eill"],
    "es": ["selas", "selos", "me", "se", "la", "amientos", "aciones",
           "logía", "ución", "encia", "amente", "mente", "idad", "ivo",
           "yeron", "yendo", "aríamos", "iésemos", "aste", "ando", "ados",
           "ar", "er", "ir", "os", "a", "e", "o", "á", "é", "gu",
           "uyendo", "iéndo"],
    "nl": ["heden", "ene", "en", "se", "s", "e", "heid", "end", "ing", "ig",
           "lijk", "baar", "bar", "kken", "dden", "tten", "yen", "ien",
           "gem", "aat", "eet", "oot"],
    "de": ["ern", "em", "er", "en", "es", "e", "s", "est", "st", "isch",
           "lich", "heit", "keit", "end", "ung", "ig", "ik", "igung",
           "igend", "erlich", "enheit", "lichkeit", "igkeit", "nisse",
           "nissen", "ss", "uyy", "eiung"],
    "da": ["erendes", "ethed", "ered", "ende", "erne", "heds", "ene", "ens",
           "en", "er", "es", "et", "e", "s", "gd", "dt", "gt", "kt",
           "elig", "løst", "lig", "els", "ig", "igst", "bb", "kk"],
    "no": ["hetenes", "heten", "endes", "ande", "erte", "ede", "ene", "ens",
           "het", "ast", "ert", "en", "ar", "er", "es", "et", "a", "e",
           "s", "dt", "vt", "hetslov", "eleg", "elig", "slov", "lig",
           "els", "lov", "ig", "ks"],
    "sv": ["heterna", "heten", "anden", "arnas", "andet", "arna", "ande",
           "aste", "ades", "ade", "are", "ern", "ens", "het", "ast", "ad",
           "en", "ar", "er", "or", "as", "es", "at", "a", "e", "s", "dd",
           "gt", "tt", "fullt", "löst", "els", "lig", "ig"],
}


@pytest.mark.skipif(not HAVE_REFERENCE, reason="reference not available")
@pytest.mark.parametrize("lang", sorted(STEMMERS))
def test_stemmer_differential(lang):
    from whoosh.lang import stemmer_for_language as ref_for

    ref = ref_for(lang)
    mine = STEMMERS[lang]
    rng = random.Random(hash(lang) & 0xFFFF)
    words = set()
    a = _ALPH[lang]
    for _ in range(6000):
        words.add("".join(rng.choices(a, k=rng.randrange(1, 11))))
    for _ in range(6000):
        stem = "".join(rng.choices(a, k=rng.randrange(1, 8)))
        words.add(stem + rng.choice(_SUFS[lang]))
        words.add(stem + rng.choice(_SUFS[lang]) + rng.choice(_SUFS[lang]))
    for w in sorted(words):
        assert mine(w) == ref(w), (lang, w)


@pytest.mark.skipif(not HAVE_REFERENCE, reason="reference not available")
@pytest.mark.parametrize("lang", ["de", "da", "no", "sv", "nl", "es", "fr", "it", "pt", "fi", "hu", "ru", "ro", "tr", "ar"])
def test_language_analyzer_differential(lang):
    from whoosh.analysis import LanguageAnalyzer as RefLA

    ref = RefLA(lang)
    mine = language_analyzer(lang)
    texts = {
        "de": [
            "Die Kinder spielten fröhlich im Garten",
            "Aufeinanderfolgende Kategorien der Wissenschaftlichkeit",
            "Schönheit und Freundlichkeit der Häuser",
        ],
        "da": [
            "Børnene legede glade i haven hele dagen",
            "Kærlighed og venlighed betyder alting",
        ],
        "no": [
            "Barna lekte lykkelig i hagen hele dagen",
            "Kjærlighet og vennlighet betyr alt",
        ],
        "sv": [
            "Barnen lekte lyckligt i trädgården hela dagen",
            "Kärlek och vänlighet betyder allting",
        ],
        "nl": [
            "De kinderen speelden vrolijk in de tuin",
            "Vriendelijkheid en liefde betekenen alles",
        ],
        "es": [
            "Por el mar corren las liebres",
            "Los niños jugaban felizmente en el jardín",
        ],
        "fr": [
            "Les enfants jouaient joyeusement dans le jardin",
            "La beauté des maisons anciennes est remarquable",
        ],
        "it": [
            "I bambini giocavano felicemente nel giardino",
            "La bellezza delle case antiche è notevole",
        ],
        "pt": [
            "As crianças brincavam alegremente no jardim",
            "A beleza das casas antigas é notável",
        ],
        "fi": [
            "Lapset leikkivät iloisesti puutarhassa",
            "Talojen kauneus on huomattava",
        ],
        "hu": [
            "A gyerekek vidáman játszottak a kertben",
            "A házak szépsége figyelemre méltó",
        ],
        "ru": [
            "Дети весело играли в саду",
            "Красота старинных домов замечательна",
        ],
        "ro": [
            "Copiii se jucau fericiţi în grădină",
            "Frumuseţea caselor vechi este remarcabilă",
        ],
        "tr": [
            "Çocuklar bahçede mutlu bir şekilde oynuyordu",
        ],
        "ar": [
            "الكتاب والمكتبة للقراءة",
            "يستعملون الحاسوب يوميا",
        ],
    }[lang]
    for t in texts:
        expect = [tok.text for tok in ref(t)]
        assert mine(t) == expect, (lang, t)


def test_stemmer_for_language_errors():
    # 'runn' is the reference Porter port's output (its doubled-consonant
    # quirk, matched by whoosh_novo_ray.porter)
    assert stemmer_for_language("en")("running") == "runn"
    with pytest.raises(ValueError):
        stemmer_for_language("xx")


def test_language_index_roundtrip(ray_session, tmp_path):
    """A German-analyzer index round-trips through config serialization and
    matches queries stemmed the same way."""
    import pyarrow as pa
    import ray.data

    from whoosh_novo_ray.index import Index, IndexConfig, build_index
    from whoosh_novo_ray.search import Searcher, Term

    texts = [
        "die kinder spielten im garten",
        "ein kind spielt gerne",
        "gartenarbeit macht freude",
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(3), pa.uint64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    out = str(tmp_path / "deidx")
    cfg = IndexConfig(analyzer=language_analyzer("de"), num_buckets=2)
    build_index(ray.data.from_arrow(tbl), out, cfg, lineage="de")
    idx = Index(out)
    assert idx.cfg.analyzer.stem_lang == "de"  # survived the manifest
    s = Searcher(idx)
    # 'kind' is the stem of kinder/kind: both docs match
    ids, _ = s.postings(Term("kind"))
    assert ids.tolist() == [0, 1]


@pytest.mark.skipif(not HAVE_REFERENCE, reason="reference not available")
def test_isri_differential():
    import random as _random

    from whoosh.lang import stemmer_for_language as ref_for

    from whoosh_novo_ray.lang_isri import stem_ar

    ref = ref_for("ar")
    rng = _random.Random(9)
    letters = [chr(c) for c in range(0x0621, 0x064B)]
    diac = [chr(c) for c in range(0x064B, 0x0653)]
    for _ in range(8000):
        w = "".join(rng.choices(letters + diac, k=rng.randrange(1, 10)))
        assert stem_ar(w) == ref(w), repr(w)
