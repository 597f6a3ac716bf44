"""Cavnar–Trenkle rank-order character-trigram language profiles.

The classic "N-Gram-Based Text Categorization" (Cavnar & Trenkle 1994,
public) classifier: build a per-language profile = the K most frequent
character trigrams of seed text ranked by frequency; classify a document by
the out-of-place distance between its own trigram ranking and each profile
(missing trigram costs K).  Deeper than the stopword argmax in
:mod:`.text` — it uses sub-word evidence, so it separates languages that
share function words — while staying 100 % SQL-expressible: integer counts,
integer ranks, integer distances, deterministic lexicographic tie-breaks.

Profiles are built at import time from in-repo seed paragraphs (a parallel
translated passage per language, so profile mass sits on function-word and
morphology trigrams).  ~PROFILE_K rows per language ship to executors as a
broadcast table and into the DuckDB oracle as a VALUES list — both engines
score against the identical model.

Scale: classification is one trigram explode (linear), one groupBy on
(doc_id, trigram), one doc_id window for the ranking, then a broadcast join
against the K×L profile — no all-pairs anything, no skew (every doc
contributes exactly ≤K ranked rows).
"""

from __future__ import annotations

from collections import Counter

__all__ = [
    "LANG_SEEDS",
    "PROFILE_K",
    "trigram_profile",
    "profile_rows",
    "classify_trigram",
]

PROFILE_K = 50

# One parallel passage per language (same content translated, ~50 words) —
# parallel text concentrates profile mass on each language's function words
# and inflection patterns, which is exactly the evidence C-T ranks.
LANG_SEEDS: dict[str, str] = {
    "da": (
        "den hurtige brune ræv hopper over den dovne hund og så løber hunden "
        "væk fordi den ikke var glad for ræven den morgen da de begge var i "
        "haven nær huset hvor den gamle mand boede som havde set dem mange "
        "gange før og han sagde at de skulle komme tilbage igen"
        " folk i byen tager ofte toget på arbejde om morgenen og de læser "
        "nyhederne mens de venter fordi gaderne er fulde af biler og der er "
        "ikke nogen plads at parkere i nærheden af det gamle marked hvor "
        "alle køber brød og frugt hver dag"
    ),
    "de": (
        "der schnelle braune fuchs springt über den faulen hund und dann "
        "läuft der hund weg weil er nicht glücklich mit dem fuchs war an "
        "diesem morgen als sie beide in dem garten neben dem haus des alten "
        "mannes waren der sie schon viele male gesehen hatte und er sagte "
        "dass sie wieder kommen sollten"
        " die leute in der stadt nehmen oft den zug zur arbeit am morgen und "
        "sie lesen die nachrichten während sie warten weil die straßen "
        "voller autos sind und es keinen platz zum parken gibt in der nähe "
        "des alten marktes wo alle jeden tag brot und obst kaufen"
    ),
    "en": (
        "the quick brown fox jumps over the lazy dog and then the dog runs "
        "away because it was not happy with the fox that morning when they "
        "were both in the garden near the house of the old man who had seen "
        "them many times before and he said that they should come back again"
        " people in the city often take the train to work in the morning and "
        "they read the news while they wait because the streets are full of "
        "cars and there is no place to park near the old market where "
        "everyone buys bread and fruit every day"
    ),
    "es": (
        "el rápido zorro marrón salta sobre el perro perezoso y luego el "
        "perro se va porque no estaba contento con el zorro esa mañana "
        "cuando los dos estaban en el jardín cerca de la casa del viejo "
        "hombre que los había visto muchas veces antes y él dijo que "
        "deberían volver otra vez"
        " la gente de la ciudad suele tomar el tren para ir al trabajo por "
        "la mañana y leen las noticias mientras esperan porque las calles "
        "están llenas de coches y no hay ningún sitio para aparcar cerca "
        "del viejo mercado donde todos compran pan y fruta cada día"
    ),
    "fr": (
        "le rapide renard brun saute par dessus le chien paresseux et puis "
        "le chien s'en va parce qu'il n'était pas content avec le renard ce "
        "matin quand ils étaient tous les deux dans le jardin près de la "
        "maison du vieil homme qui les avait vus plusieurs fois avant et il "
        "a dit qu'ils devraient revenir encore"
        " les gens de la ville prennent souvent le train pour aller au "
        "travail le matin et ils lisent les nouvelles en attendant parce "
        "que les rues sont pleines de voitures et il n'y a pas de place "
        "pour se garer près du vieux marché où tout le monde achète du pain "
        "et des fruits chaque jour"
    ),
    "it": (
        "la rapida volpe marrone salta sopra il cane pigro e poi il cane se "
        "ne va perché non era contento con la volpe quella mattina quando "
        "erano entrambi nel giardino vicino alla casa del vecchio uomo che "
        "li aveva visti molte volte prima e lui disse che sarebbero dovuti "
        "tornare ancora"
        " la gente della città prende spesso il treno per andare al lavoro "
        "la mattina e leggono le notizie mentre aspettano perché le strade "
        "sono piene di macchine e non c'è posto per parcheggiare vicino al "
        "vecchio mercato dove tutti comprano pane e frutta ogni giorno"
    ),
    "nl": (
        "de snelle bruine vos springt over de luie hond en dan loopt de "
        "hond weg omdat hij niet blij was met de vos die ochtend toen ze "
        "allebei in de tuin waren naast het huis van de oude man die hen al "
        "vele keren had gezien en hij zei dat ze weer terug moesten komen"
        " de mensen in de stad nemen vaak de trein naar het werk in de "
        "ochtend en ze lezen het nieuws terwijl ze wachten omdat de straten "
        "vol auto's staan en er geen plek is om te parkeren in de buurt van "
        "de oude markt waar iedereen elke dag brood en fruit koopt"
    ),
    "pt": (
        "a rápida raposa marrom pula sobre o cão preguiçoso e depois o cão "
        "vai embora porque não estava contente com a raposa naquela manhã "
        "quando os dois estavam no jardim perto da casa do velho homem que "
        "os tinha visto muitas vezes antes e ele disse que eles deveriam "
        "voltar outra vez"
        " as pessoas da cidade costumam apanhar o comboio para o trabalho de "
        "manhã e leem as notícias enquanto esperam porque as ruas estão "
        "cheias de carros e não há lugar para estacionar perto do velho "
        "mercado onde todos compram pão e fruta todos os dias"
    ),
    "sv": (
        "den snabba bruna räven hoppar över den lata hunden och sedan "
        "springer hunden iväg eftersom den inte var nöjd med räven den "
        "morgonen när de båda var i trädgården nära huset där den gamle "
        "mannen bodde som hade sett dem många gånger förut och han sade att "
        "de skulle komma tillbaka igen"
        " folk i staden tar ofta tåget till jobbet på morgonen och de läser "
        "nyheterna medan de väntar eftersom gatorna är fulla av bilar och "
        "det finns ingen plats att parkera i närheten av den gamla "
        "marknaden där alla köper bröd och frukt varje dag"
    ),
    "tr": (
        "hızlı kahverengi tilki tembel köpeğin üzerinden atlar ve sonra "
        "köpek kaçar çünkü o sabah tilkiden memnun değildi ikisi de yaşlı "
        "adamın evinin yanındaki bahçedeyken onları daha önce birçok kez "
        "görmüştü ve onlara tekrar gelmeleri gerektiğini söyledi"
        " şehirdeki insanlar sabahları işe gitmek için genellikle trene "
        "biner ve beklerken haberleri okurlar çünkü sokaklar arabalarla "
        "dolu ve herkesin her gün ekmek ve meyve aldığı eski pazarın "
        "yakınında park edecek yer yoktur"
    ),
}


def _normalize(text: str) -> str:
    """Letters → lowercase, any non-letter run → one space.  Mirrors the
    Spark/DuckDB normalization ``lower(regexp_replace(text, '[^\\p{L}]+',
    ' '))`` for the seed text (profile building happens in Python only;
    cross-engine bit-equality applies to document scoring, not seeds)."""
    out = []
    prev_space = False
    for ch in text.lower():
        if ch.isalpha():
            out.append(ch)
            prev_space = False
        elif not prev_space:
            out.append(" ")
            prev_space = True
    return "".join(out).strip()


def trigram_profile(text: str, k: int = PROFILE_K) -> list[tuple[str, int]]:
    """Top-k character trigrams of the normalized text as (trigram, rank)
    with rank 1..k, ordered by (count desc, trigram asc) — the same total
    order the SQL ranking uses, so ties break identically everywhere."""
    t = _normalize(text)
    counts = Counter(t[i : i + 3] for i in range(max(len(t) - 2, 0)))
    ordered = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return [(g, r + 1) for r, (g, _) in enumerate(ordered)]


def profile_rows(k: int = PROFILE_K) -> list[tuple[str, str, int]]:
    """(lang, trigram, rank) rows for every seed language — the broadcast
    model table, also rendered into the DuckDB oracle as VALUES."""
    rows: list[tuple[str, str, int]] = []
    for lang in sorted(LANG_SEEDS):
        for g, r in trigram_profile(LANG_SEEDS[lang], k):
            rows.append((lang, g, r))
    return rows


def classify_trigram(df, text_col: str, id_col: str):
    """Classify each row's text by out-of-place trigram distance against
    every language profile.  Returns (id, pred_lang, distance) — rows whose
    normalized text has no trigram (length < 3) are dropped.  See module
    docstring for the scale shape."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    spark = df.sparkSession
    t = F.lower(F.regexp_replace(F.col(text_col), r"[^\p{L}]+", " "))
    norm = df.select(F.col(id_col).alias("__id"), t.alias("t")).filter(F.length("t") >= 3)
    tri = norm.select(
        "__id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("t") - 2),
                lambda i: F.col("t").substr(i, F.lit(3)),
            )
        ).alias("g"),
    )
    cnt = tri.groupBy("__id", "g").agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("__id").orderBy(F.col("c").desc(), F.col("g").asc())
    topk = cnt.withColumn("r", F.row_number().over(w)).filter(F.col("r") <= PROFILE_K)
    prof = spark.createDataFrame(profile_rows(), "lang string, g string, pr int")
    langs = prof.select("lang").distinct()
    dist = (
        topk.crossJoin(F.broadcast(langs))
        .join(F.broadcast(prof), ["lang", "g"], "left")
        .groupBy("__id", "lang")
        .agg(
            F.sum(F.coalesce(F.abs(F.col("r") - F.col("pr")), F.lit(PROFILE_K)))
            .cast("long")
            .alias("distance")
        )
    )
    w2 = Window.partitionBy("__id").orderBy(F.col("distance").asc(), F.col("lang").asc())
    return (
        dist.withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") == 1)
        .select(F.col("__id").alias(id_col), F.col("lang").alias("pred_lang"), "distance")
    )
