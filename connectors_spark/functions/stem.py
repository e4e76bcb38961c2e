"""Stemmer stage of the analyzer chain (language_data.yml parity).

The reference's indices analyze with a per-language filter chain:
lowercase -> stop words -> stemmer (reference: app/connectors_service/
connectors/es/language_data.yml:10-13 `en` -> `light_english`, elision for
fr/it at lines 22-73). This module supplies the stemmer stage three ways so
build side, query side, NumPy oracle and DuckDB oracle share ONE
definition per stemmer:

- `minimal_english` — Lucene's EnglishMinimalStemFilter (Harman's
  S-stemmer; public Lucene semantics). Small enough to express as a pure
  JVM Column expression (whole-stage codegen, no UDF) AND as a DuckDB SQL
  fragment, so it is the stemmer the correctness GATE runs end-to-end.
- `english` — the snowball English stemmer ("Porter2", public algorithm,
  snowballstem.org). Implemented in pure Python below, shared verbatim by
  the Spark side (Arrow-batched pandas_udf over token arrays — the one
  deliberate UDF in the analyzer, same slow-path budget the reference
  spends calling Elasticsearch's analyzer) and the NumPy oracle. DuckDB's
  snowball lives in the `fts` extension which cannot be downloaded in
  this environment, so this stemmer is pytest-gated (golden vectors +
  engine-vs-oracle rank identity) instead of DuckDB-gated.
- `fr_elision` — the reference's French elision filter (l'/qu'/... article
  stripping, language_data.yml:22-33), expressible in all three engines.

The reference's `en` default maps to `light_english` = Lucene KStem
(Krovetz 1993, "Viewing morphology as an inference process"), a
DICTIONARY-gated stemmer: every transformation (plural -> singular, past
-> present, -ing removal, derivational endings) consults a lexicon, and
words already in the lexicon are never touched — which is why KStem
output stays real words ("agreed" -> "agree") where Porter2 produces
stems ("agre"). Lucene ships the ~30k-entry lexicon as data files that
are not re-derivable here, so `kstem` below implements the ALGORITHMIC
core with a compact built-in lexicon (+ a direct-conflation table for
irregulars) and accepts a caller-supplied lexicon (e.g. the corpus
vocabulary). Residual deltas vs Lucene's light_english are exactly the
missing dictionary entries: an unknown word falls through to Krovetz's
default suffix rules instead of a dictionary hit (documented in
COVERAGE.md; golden vectors pin the public behaviors).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

STEMMERS = ("none", "minimal_english", "english", "kstem")

# --------------------------------------------------------------------
# minimal_english — Lucene EnglishMinimalStemFilter (S-stemmer)
# --------------------------------------------------------------------


def minimal_english_py(w: str) -> str:
    """Python mirror (used by tokenize_py / the NumPy oracle)."""
    n = len(w)
    if n < 3 or w[-1] != "s":
        return w
    p = w[-2]
    if p in ("u", "s"):
        return w
    if p == "e":
        if n > 3 and w[-3] == "i" and w[-4] not in ("a", "e"):
            return w[:-3] + "y"
        if w[-3] in ("i", "a", "o", "e"):
            return w
        return w[:-1]
    return w[:-1]


def minimal_english_col(t: Column) -> Column:
    """JVM Column twin of `minimal_english_py` (codegen'd, no UDF)."""
    n = F.length(t)
    c1 = t.substr(n, F.lit(1))
    c2 = t.substr(n - 1, F.lit(1))
    c3 = t.substr(n - 2, F.lit(1))
    c4 = t.substr(n - 3, F.lit(1))
    drop_s = t.substr(F.lit(1), n - 1)
    ies_y = F.concat(t.substr(F.lit(1), n - 3), F.lit("y"))
    return (
        F.when((n < 3) | (c1 != "s"), t)
        .when(c2.isin("u", "s"), t)
        .when(
            c2 == "e",
            F.when((n > 3) & (c3 == "i") & (~c4.isin("a", "e")), ies_y)
            .when(c3.isin("i", "a", "o", "e"), t)
            .otherwise(drop_s),
        )
        .otherwise(drop_s)
    )


def minimal_english_sql(t: str) -> str:
    """DuckDB twin of `minimal_english_py` (`t` is a token expression)."""
    return (
        f"CASE WHEN length({t}) < 3 OR substr({t}, -1, 1) <> 's' THEN {t} "
        f"WHEN substr({t}, -2, 1) IN ('u','s') THEN {t} "
        f"WHEN substr({t}, -2, 1) = 'e' THEN "
        f"(CASE WHEN length({t}) > 3 AND substr({t}, -3, 1) = 'i' "
        f"AND substr({t}, -4, 1) NOT IN ('a','e') "
        f"THEN substr({t}, 1, length({t})-3) || 'y' "
        f"WHEN substr({t}, -3, 1) IN ('i','a','o','e') THEN {t} "
        f"ELSE substr({t}, 1, length({t})-1) END) "
        f"ELSE substr({t}, 1, length({t})-1) END"
    )


# --------------------------------------------------------------------
# fr elision — language_data.yml:22-33 articles
# --------------------------------------------------------------------

FR_ELISION_ARTICLES = ("l", "m", "t", "qu", "n", "s", "j", "d", "c",
                       "jusqu", "quoiqu", "lorsqu", "puisqu")


def fr_elision_py(w: str) -> str:
    for a in FR_ELISION_ARTICLES:
        if w.startswith(a + "'"):
            return w[len(a) + 1:]
    return w


def fr_elision_col(t: Column) -> Column:
    out = t
    # longest-first so jusqu' wins over j'
    for a in sorted(FR_ELISION_ARTICLES, key=len, reverse=True):
        out = F.when(t.startswith(a + "'"), t.substr(F.lit(len(a) + 2), F.length(t))).otherwise(out)
    return out


# --------------------------------------------------------------------
# english — snowball English ("Porter2"), public algorithm
# --------------------------------------------------------------------

_VOWELS = set("aeiouy")
_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
_LI_ENDING = set("cdeghkmnrt")

_EXCEPTIONS = {
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl",
    # invariants
    "sky": "sky", "news": "news", "howe": "howe", "atlas": "atlas",
    "cosmos": "cosmos", "bias": "bias", "andes": "andes",
}
_EXCEPTIONS_1A = {"inning", "outing", "canning", "herring", "earring",
                  "proceed", "exceed", "succeed"}


def _is_vowel(w: str, i: int) -> bool:
    return w[i] in _VOWELS


def _r1_r2(w: str) -> tuple[int, int]:
    """Start offsets of R1 and R2 (len(w) when absent)."""
    n = len(w)
    if w.startswith(("gener", "commun", "arsen")):
        r1 = 6 if w.startswith("commun") else 5
    else:
        r1 = n
        for i in range(1, n):
            if not _is_vowel(w, i) and _is_vowel(w, i - 1):
                r1 = i + 1
                break
    r2 = n
    for i in range(r1 + 1, n):
        if not _is_vowel(w, i) and _is_vowel(w, i - 1):
            r2 = i + 1
            break
    return r1, r2


def _ends_short_syllable(w: str) -> bool:
    """True if w ends in a short syllable (snowball definition)."""
    n = len(w)
    if n == 2:
        return _is_vowel(w, 0) and not _is_vowel(w, 1)
    if n >= 3:
        # non-vowel, vowel, non-vowel (and the last is not w/x/Y)
        return (
            not _is_vowel(w, n - 3)
            and _is_vowel(w, n - 2)
            and not _is_vowel(w, n - 1)
            and w[n - 1] not in ("w", "x", "Y")
        )
    return False


def _is_short(w: str, r1: int) -> bool:
    return r1 >= len(w) and _ends_short_syllable(w)


def english_py(word: str) -> str:  # noqa: C901 — the algorithm IS a case table
    """Snowball English stemmer (Porter2) — public algorithm, shared by
    the Spark pandas_udf and the NumPy oracle."""
    w = word.lower()
    if len(w) <= 2:
        return w
    if w[0] == "'":
        w = w[1:]
    if w in _EXCEPTIONS:
        return _EXCEPTIONS[w]
    # mark consonant-y as Y (initial y, or y after a vowel), sequentially
    # so runs like 'yy' mark correctly
    chars = list(w)
    prev_vowel = False
    for i, c in enumerate(chars):
        if c == "y" and (i == 0 or prev_vowel):
            chars[i] = "Y"
            prev_vowel = False
        else:
            prev_vowel = c in _VOWELS
    w = "".join(chars)

    # step 0: apostrophe suffixes
    for suf in ("'s'", "'s", "'"):
        if w.endswith(suf):
            w = w[: -len(suf)]
            break

    r1, r2 = _r1_r2(w)

    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith(("ied", "ies")):
        # -> i if preceded by more than one letter, else -> ie
        stem = w[:-3]
        w = stem + ("i" if len(stem) > 1 else "ie")
    elif w.endswith(("us", "ss")):
        pass
    elif w.endswith("s"):
        # delete if a vowel exists before the char preceding the s
        if any(_is_vowel(w, i) for i in range(len(w) - 2)):
            w = w[:-1]

    if w in _EXCEPTIONS_1A:
        return w

    # step 1b
    r1, r2 = _r1_r2(w)
    if w.endswith(("eedly", "eed")):
        suf = "eedly" if w.endswith("eedly") else "eed"
        if len(w) - len(suf) >= r1:
            w = w[: len(w) - len(suf)] + "ee"
    else:
        for suf in ("ingly", "edly", "ing", "ed"):
            if w.endswith(suf):
                stem = w[: -len(suf)]
                if any(_is_vowel(stem, i) for i in range(len(stem))):
                    w = stem
                    if w.endswith(("at", "bl", "iz")):
                        w += "e"
                    elif w.endswith(_DOUBLES):
                        w = w[:-1]
                    elif _is_short(w, _r1_r2(w)[0]):
                        w += "e"
                break

    # step 1c: y/Y -> i after a non-vowel that is not word-initial
    if len(w) > 2 and w[-1] in ("y", "Y") and not _is_vowel(w, len(w) - 2):
        w = w[:-1] + "i"

    r1, r2 = _r1_r2(w)

    # step 2 (longest suffix, inside R1)
    step2 = [
        ("ization", "ize"), ("ational", "ate"), ("fulness", "ful"),
        ("ousness", "ous"), ("iveness", "ive"), ("tional", "tion"),
        ("biliti", "ble"), ("lessli", "less"), ("entli", "ent"),
        ("ation", "ate"), ("alism", "al"), ("aliti", "al"),
        ("ousli", "ous"), ("iviti", "ive"), ("fulli", "ful"),
        ("enci", "ence"), ("anci", "ance"), ("abli", "able"),
        ("izer", "ize"), ("ator", "ate"), ("alli", "al"),
        ("bli", "ble"),
    ]
    for suf, rep in step2:
        if w.endswith(suf):
            if len(w) - len(suf) >= r1:
                w = w[: -len(suf)] + rep
            break
    else:
        if w.endswith("ogi"):
            if len(w) - 3 >= r1 and len(w) > 3 and w[-4] == "l":
                w = w[:-1]
        elif w.endswith("li"):
            if len(w) - 2 >= r1 and len(w) > 2 and w[-3] in _LI_ENDING:
                w = w[:-2]

    r1, r2 = _r1_r2(w)

    # step 3 (inside R1; 'ative' needs R2)
    step3 = [
        ("ational", "ate"), ("tional", "tion"), ("alize", "al"),
        ("icate", "ic"), ("iciti", "ic"), ("ical", "ic"),
        ("ful", ""), ("ness", ""),
    ]
    for suf, rep in step3:
        if w.endswith(suf):
            if len(w) - len(suf) >= r1:
                w = w[: -len(suf)] + rep
            break
    else:
        if w.endswith("ative") and len(w) - 5 >= r2:
            w = w[:-5]

    r1, r2 = _r1_r2(w)

    # step 4 (inside R2)
    step4 = ["ement", "ance", "ence", "able", "ible", "ment",
             "ant", "ent", "ism", "ate", "iti", "ous", "ive", "ize",
             "al", "er", "ic"]
    for suf in step4:
        if w.endswith(suf):
            if len(w) - len(suf) >= r2:
                w = w[: -len(suf)]
            break
    else:
        if w.endswith("ion") and len(w) - 3 >= r2 and len(w) > 3 and w[-4] in ("s", "t"):
            w = w[:-3]

    r1, r2 = _r1_r2(w)

    # step 5
    if w.endswith("e"):
        if len(w) - 1 >= r2:
            w = w[:-1]
        elif len(w) - 1 >= r1 and not _ends_short_syllable(w[:-1]):
            w = w[:-1]
    elif w.endswith("l") and len(w) - 1 >= r2 and len(w) > 1 and w[-2] == "l":
        w = w[:-1]

    return w.replace("Y", "y")


# --------------------------------------------------------------------
# kstem — algorithmic core of Krovetz's KStem (ES/Lucene `light_english`)
# --------------------------------------------------------------------

# Direct conflations: irregular forms the dictionary step maps outright
# (Lucene's KStem ships these as data; this is the common-English core).
KSTEM_DIRECT = {
    "children": "child", "men": "man", "women": "woman", "feet": "foot",
    "teeth": "tooth", "geese": "goose", "mice": "mouse", "oxen": "ox",
    "lives": "life", "wives": "wife", "knives": "knife", "leaves": "leaf",
    "selves": "self", "shelves": "shelf", "loaves": "loaf",
    "halves": "half", "wolves": "wolf", "indices": "index",
    "matrices": "matrix", "vertices": "vertex", "criteria": "criterion",
    "phenomena": "phenomenon", "data": "data", "media": "media",
    "analyses": "analysis", "crises": "crisis", "theses": "thesis",
    "oases": "oasis", "axes": "axis", "fungi": "fungus", "cacti": "cactus",
}

# Compact built-in lexicon: base forms whose membership gates the
# e-restoration / undoubling / derivational steps. Lucene's is ~30k
# entries; this is the high-frequency core plus every word the golden
# vectors and engine tests need. Callers may pass a larger lexicon
# (e.g. the corpus vocabulary) via kstem_py(..., lexicon=...).
KSTEM_LEXICON = frozenset("""
a able about access act add age agree air all also and answer any area
ask at back bad base batch be become begin best big bind bit block book
box break bring budget bug build bus busy buy by call can car care carry
case cat catch cause change char chart check child choose church city
class clean clear close cloud cluster code column come commit common
compute config connect consider continue control copy core cost count
country course cover crash create cross cut data date day deal debug
decide deep delete deny design detail develop die differ do dog door
down draw drive drop dump each early earn ease east easy eat edge edit
effect elephant else empty end engine enter error even event ever every
except exceed expect eye face fact fail fall family far fast fault feed
feel few field file fill filter find fine fire first fit fix flag float
flow fly focus follow foot for force fork form found fox frame free
fresh front full fun game gas gate gear get give go good govern grant
graph great group grow guard guess guide hand handle happen happy hard
hash have he head hear heat help her here hide high hit hold home hope
hop host hot hour house how human id idea if image in index info input
insert inside issue it item job join jump just keep key kill kind know
label land large last late lead leaf learn leave left less let level
lie life light like limit line link list listen little live load local
lock log long look lose lot low machine mail main make man manage map
mark match may mean measure meet member memory merge mesh might mind
mine miss mix mode model money month more most move much must name near
need nest net new news next nice night node north not note now null
number object of off offer often old on once one only open order other
out output over own pack page pair parse part pass past patch path pay
peer per phase pick piece pin place plan play plot point pool port pose
post power press prime print probe process produce program prove pull
push put query question queue quick quiet quite race raise range rank
rate reach read real reason recent record reduce refer region rely
remain remove rename repair report require reset rest result retry
return review ride right ring rise risk road rock role roll room root
route row rule run safe same save say scale scan schema score search
seat see seed seek seem select self sell send sense serve set shape
share shard shell shift ship short show side sign simple since sing
single sink sit site size skip sleep slice slow small socket soft solve
some sort sound source south space spark spawn speak speed spend spill
split stack stage stand star start state stay stem step stop store
stream strong style sum supply support sure swap sync system table tag
tail take talk tan target task team tell term test text than that the
then there thing think this thread tie time tiny to today token tool
top touch trace track train transfer tree trim trip true try tune
turn type under unit until up update use user utter value verify very
view visit vote wait walk want warm warn watch water way we wear week
well west what when where which while white who whole why wide will win
window wire wish with word work world would wrap write year yes yet
yield zero zone
able above accept account achieve acquire adapt adjust admit adopt
advance advise affect afford agent allow amount analyze announce
appear apply approve argue arrive assess assign assume attach attempt
attend avoid award balance become begin behave believe belong benefit
board borrow bottle bottom branch breathe bridge brief bring broad
brother budget burden burn busy button cache cancel capture career
cause celebrate center chain chair challenge chance channel chapter
charge chase cheap choice circle claim climb clock cluster coach
collect college combine comfort command comment company compare
compile complete concern conclude condition confirm congress consist
constant consume contain contest context contract contrast contribute
convert cook cool corner correct couple courage create credit crew
critic crowd culture curious current curve custom cycle damage dance
danger debate decade declare decline decrease defend define degree
deliver demand depend deploy describe desert deserve destroy detect
device devote differ digital direct discover discuss disease display
distance divide doctor document dollar domain double doubt dozen
dream dress drink driver during duty eager economy edition educate
either elect element emerge employ enable encode encourage enemy
energy engage enjoy enough ensure entire entry episode equal escape
estimate evaluate evening exact examine example exceed exchange
excite exercise exist expand expert explain explore express extend
extra factor familiar famous fashion feature fellow female figure
final finance finish flavor flight floor forest forget formal format
former fortune forward frequent friend future garden gather general
gentle glass global golden grammar grand gravity ground guarantee
guest habit hammer happen harbor health heavy height hello hidden
history hobby hollow honest honor horizon hotel hundred hunger hurry
ignore illegal imagine impact import improve include income increase
indeed industry inform initial inject injure inner insist install
instance instead intend interest invest invite involve island item
jacket journal journey judge junior justice knight labor ladder
language launch lawyer leader legal lesson letter library license
likely liquid listen little locate logic lonely lucky luxury machine
magic major manner margin market master material matter mature
maximum meaning medical medium mention message metal method middle
military million minimum minor minute mirror mission mistake mobile
moment monitor moral morning motion motor mountain movie multiple
muscle music mutual narrow nation native nature nearly neither
nervous network never noble normal notice notion novel nuclear
obtain occur ocean offer office often opinion oppose option orange
organ origin outer oxygen package palace panel paper parent partner
party patient pattern peace people pepper perfect perform period
permit person phone photo phrase physical picture pioneer pleasure
plenty pocket poetry policy polite popular portion position positive
possess possible powder practice praise predict prefer prepare
present pretty prevent previous price pride primary prince princess
private prize problem proceed product profile profit promise promote
proper propose protect proud provide public publish purple purpose
pursue quality quantity quarter quick quiet radio rather reach
realize really recall receive recipe reckon recover reflect reform
refuse regard regular reject relate release relief remember remind
repeat replace reply request rescue research reserve resist resolve
resource respect respond restore retain retire reveal revenue
reverse ribbon river rocket rough royal rubber rural sacred sacrifice
sadly salad salary sample satisfy sauce scatter scene schedule scheme
scholar school science screen script season second secret section
secure seldom senior sentence series serious service session settle
seven severe shadow shallow shelter shine shoulder shout shower sight
signal silent silver similar simple single sister situate sketch
skill slight smart smile smooth society soldier solid solution
someone sorry speak special species specific spirit sponsor spread
spring square stable stadium staff standard statue status steady
steel stick still stomach storage story strange street stretch
strike string structure student studio study stuff subject submit
substance succeed success sudden suffer suggest summer supreme
surface surprise survey survive suspect sustain sweet symbol
sympathy taste teach temple tender tension territory theater theory
thick thunder ticket tight timber tissue title together tomorrow
tongue topic total tourist toward tower trade tradition traffic
tragedy trail transform translate travel treasure treat tremble
trial tribe trouble trust tunnel twice ugly umbrella uncle under
understand union unique unite universe unless until upset urban
urgent usual vacuum valley various vehicle venture version victim
victory village violent virtue vision visual vital voice volume
wander waste weapon weather wedding weight welcome window winter
wisdom witness wonder wooden worry worth wound yellow young
alias bias lens atlas canvas chaos basis analysis crisis census
corpus status virus bonus campus iris thesis axis oasis circus
genius radius consensus surplus stylus walrus cactus fungus
""".split())


def _kstem_once(w: str, lexicon: frozenset) -> str:
    """One pass of the KStem rule cascade (see kstem_py)."""
    if len(w) < 3 or not w.isalpha():
        return w
    d = KSTEM_DIRECT.get(w)
    if d is not None:
        return d
    if w in lexicon:
        return w

    vowels = "aeiouy"

    # ---- plural -> singular ----
    if w.endswith("s"):
        if w.endswith("ies") and len(w) > 4:
            w2 = w[:-3] + "y"
        elif w.endswith("es") and len(w) > 3:
            drop_s, base = w[:-1], w[:-2]
            # dictionary gating FIRST (the KStem contract): 'houses' ->
            # 'house' (drop s), 'churches' -> 'church' (drop es); only
            # unknown stems fall to the sibilant heuristic
            if drop_s in lexicon:
                w2 = drop_s
            elif base in lexicon:
                w2 = base
            elif base.endswith(("s", "z", "x", "ch", "sh")):
                w2 = base
            else:
                w2 = drop_s
        elif not w.endswith(("ss", "us")) and len(w) > 3:
            # bare -s strip, dictionary-conservative: a base noun ending
            # vowel+s (alias, basis, chaos) is NOT a plural unless the
            # stripped form is a known word ('areas' -> 'area').
            drop = w[:-1]
            if drop in lexicon:
                w2 = drop
            elif w[-2] in "aio":
                w2 = w
            else:
                w2 = drop
        else:
            w2 = w
        if w2 != w:
            w = w2
            if w in lexicon:
                return w

    # ---- past tense ----
    if w.endswith("ied") and len(w) > 4:
        w = w[:-3] + "y"
        if w in lexicon:
            return w
    elif w.endswith("ed") and len(w) > 4:
        stem = w[:-2]
        if stem + "e" in lexicon:
            return stem + "e"
        if stem in lexicon:
            return stem
        if (len(stem) > 2 and stem[-1] == stem[-2]
                and stem[-1] not in vowels):
            und = stem[:-1]
            if und in lexicon:
                return und
            w = und  # Krovetz default: undouble
        else:
            w = stem
        if w in lexicon:
            return w

    # ---- -ing ----
    if w.endswith("ing") and len(w) > 5:
        stem = w[:-3]
        if any(c in vowels for c in stem):
            if stem + "e" in lexicon:
                return stem + "e"
            if stem in lexicon:
                return stem
            if (len(stem) > 2 and stem[-1] == stem[-2]
                    and stem[-1] not in vowels):
                und = stem[:-1]
                if und in lexicon:
                    return und
                w = und
            else:
                w = stem
            if w in lexicon:
                return w

    # ---- derivational endings: LEXICON-GATED ONLY (no default rule —
    # this is what keeps kstem light: "quickly" stays "quickly") ----
    for suf, reps in (
        ("iness", ("y",)), ("ness", ("",)), ("ful", ("",)),
        ("ization", ("ize", "e")), ("ity", ("e", "")), ("ily", ("y",)),
        ("ion", ("e", "")), ("er", ("", "e")), ("ment", ("",)),
        ("able", ("", "e")), ("ible", ("", "e")),
    ):
        if w.endswith(suf) and len(w) - len(suf) >= 2:
            base = w[: -len(suf)]
            for rep in reps:
                cand = base + rep
                if cand in lexicon:
                    return cand
            break
    return w


def kstem_py(word: str, lexicon: frozenset = KSTEM_LEXICON) -> str:
    """Krovetz KStem algorithmic core (ES `light_english` analog).

    Dictionary-gated: direct conflations first, lexicon words unchanged;
    then plural -> singular, '-ied'/'-ed', '-ing' with e-restoration and
    undoubling preferring lexicon hits; finally a derivational family
    applied ONLY when the candidate is a lexicon word (KStem's defining
    conservatism). Unknown words fall through to Krovetz's default
    suffix rules.

    The cascade is iterated to a FIXPOINT, which makes the stemmer
    idempotent by construction: build and query sides stem
    independently, so a doc token and the query typed against its base
    form must conflate to the same stem ('aliases' and 'alias' both ->
    'alias' via the lexicon; unknown unstable forms erode to the same
    fixpoint on both sides). Each non-fixpoint pass either returns a
    lexicon word (itself a fixpoint) or strictly shortens the word, so
    the loop terminates. Reference behavior it replaces: the `en`
    analyzer's light_english stage, app/connectors_service/connectors/
    es/language_data.yml:10-13.
    """
    w = word
    for _ in range(len(word) + 1):
        s = _kstem_once(w, lexicon)
        if s == w:
            return w
        w = s
    return w


def stem_py(token: str, stemmer: str) -> str:
    if stemmer == "minimal_english":
        return minimal_english_py(token)
    if stemmer == "english":
        return english_py(token)
    if stemmer == "kstem":
        return kstem_py(token)
    return token
