"""Character-trigram language identification (Cavnar & Trenkle-style
n-gram profiles, public-knowledge technique).

Profiles are the top-K most frequent character trigrams of built-in
sample texts, ~8 sentences per language (written here, no external
data) — deterministic:
ties break lexicographically.  A document's score per language is the
number of its trigram OCCURRENCES found in that language's profile;
the label is the argmax (ties → lexicographically first language,
'und' when nothing matches).

Everything downstream is JVM-side column expressions (trigram explode →
broadcast profile join → count → argmax window) and replays exactly in
SQL, so the `lang_id_trigram` query is hash-checkable in DuckDB.

Profiles are DIACRITIC-PRESERVING (round-5): the earlier ASCII-folded
samples made short Polish collide with Romance vowel-ending trigrams
(pl→it by one profile hit, the round-4 held-out miss).  Natural
orthography separates it — ż/ł/ą/ę trigrams occur in no other
profile — and the same holds for tr (ı/ğ/ş), sv (å/ä/ö) and de (ü/ä).
Held-out accuracy (one unseen natural-orthography sentence per
language, none in the samples): 11/11, pinned by
tests/test_queries.py::test_lang_id_trigram_held_out.  Both Spark and
DuckDB treat length/substr/lower as character-wise UTF-8, so the
oracle replay stays exact.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SAMPLES: dict[str, str] = {
    "en": (
        "the quick brown fox jumps over the lazy dog it was a bright "
        "cold day in april and the clocks were striking thirteen all "
        "happy families are alike this is a story about the people who "
        "lived there and the things that they did with their time in "
        "the morning the fishermen carried their nets down to the grey "
        "harbour and waited for the tide to turn the market square "
        "smelled of fresh bread and wood smoke while the children "
        "walked slowly to school under the old clock tower at night the "
        "stars turned above the quiet roofs of the town and the river "
        "moved dark and patient toward the distant sea"
    ),
    "de": (
        "der schnelle braune fuchs springt über den faulen hund es war "
        "ein heller kalter tag im april und die uhren schlugen dreizehn "
        "alle glücklichen familien sind einander ähnlich dies ist "
        "eine geschichte über die menschen die dort lebten und was sie "
        "taten am morgen trugen die fischer ihre netze hinunter zum "
        "grauen hafen und warteten darauf dass die flut kehrte der "
        "marktplatz roch nach frischem brot und holzrauch während die "
        "kinder langsam unter dem alten uhrturm zur schule gingen "
        "nachts drehten sich die sterne über den stillen dächern der "
        "stadt und der fluss zog dunkel und geduldig zum fernen meer"
    ),
    "fr": (
        "le rapide renard brun saute par dessus le chien paresseux c "
        "était une journée claire et froide d avril et les horloges "
        "sonnaient treize heures toutes les familles heureuses se "
        "ressemblent c est une histoire sur les gens qui vivaient là au "
        "matin les pêcheurs portaient leurs filets vers le port gris et "
        "attendaient que la marée tourne la place du marché sentait le "
        "pain frais et la fumée de bois pendant que les enfants "
        "marchaient lentement vers l école sous la vieille tour de l "
        "horloge la nuit les étoiles tournaient au dessus des toits "
        "tranquilles de la ville et la rivière coulait sombre et "
        "patiente vers la mer lointaine"
    ),
    "es": (
        "el rápido zorro marrón salta sobre el perro perezoso era un "
        "día luminoso y frío de abril y los relojes daban las trece "
        "todas las familias felices se parecen esta es una historia "
        "sobre la gente que vivía allí y las cosas que hacía por la "
        "mañana los pescadores llevaban sus redes hacia el puerto gris "
        "y esperaban a que cambiara la marea la plaza del mercado olía "
        "a pan fresco y a humo de leña mientras los niños caminaban "
        "despacio hacia la escuela bajo la vieja torre del reloj por la "
        "noche las estrellas giraban sobre los tejados tranquilos del "
        "pueblo y el río corría oscuro y paciente hacia el mar lejano"
    ),
    "it": (
        "la rapida volpe marrone salta sopra il cane pigro era una "
        "giornata limpida e fredda di aprile e gli orologi battevano le "
        "tredici tutte le famiglie felici si somigliano questa è una "
        "storia sulle persone che vivevano lì e sulle cose che facevano "
        "al mattino i pescatori portavano le loro reti verso il porto "
        "grigio e aspettavano che la marea cambiasse la piazza del "
        "mercato profumava di pane fresco e di fumo di legna mentre i "
        "bambini camminavano lentamente verso la scuola sotto la "
        "vecchia torre dell orologio di notte le stelle giravano sopra "
        "i tetti tranquilli della città e il fiume scorreva scuro e "
        "paziente verso il mare lontano"
    ),
    "pt": (
        "a rápida raposa marrom salta sobre o cão preguiçoso era um dia "
        "claro e frio de abril e os relógios batiam as treze horas "
        "todas as famílias felizes se parecem esta é uma história sobre "
        "as pessoas que moravam ali e as coisas que elas faziam com o "
        "tempo de manhã os pescadores levavam as suas redes para o "
        "porto cinzento e esperavam que a maré virasse a praça do "
        "mercado cheirava a pão fresco e a fumo de lenha enquanto as "
        "crianças caminhavam devagar para a escola sob a velha torre do "
        "relógio à noite as estrelas giravam sobre os telhados "
        "tranquilos da cidade e o rio corria escuro e paciente para o "
        "mar distante"
    ),
    "nl": (
        "de snelle bruine vos springt over de luie hond het was een "
        "heldere koude dag in april en de klokken sloegen dertien alle "
        "gelukkige gezinnen lijken op elkaar dit is een verhaal over de "
        "mensen die daar woonden en de dingen die zij met hun tijd "
        "deden in de ochtend droegen de vissers hun netten naar de "
        "grijze haven en wachtten tot het getij keerde het marktplein "
        "rook naar vers brood en houtrook terwijl de kinderen langzaam "
        "naar school liepen onder de oude klokkentoren s nachts "
        "draaiden de sterren boven de stille daken van de stad en de "
        "rivier stroomde donker en geduldig naar de verre zee"
    ),
    "sv": (
        "den snabba bruna räven hoppar över den lata hunden det var en "
        "ljus kall dag i april och klockorna slog tretton alla lyckliga "
        "familjer liknar varandra detta är en berättelse om människorna "
        "som bodde där och om de saker som de gjorde med sin tid på "
        "morgonen bar fiskarna sina nät ner till den gråa hamnen och "
        "väntade på att tidvattnet skulle vända torget luktade färskt "
        "bröd och vedrök medan barnen gick långsamt till skolan under "
        "det gamla klocktornet om natten vred sig stjärnorna över "
        "stadens tysta tak och floden rann mörk och tålmodig mot det "
        "avlägsna havet"
    ),
    "pl": (
        "szybki brązowy lis przeskakuje nad leniwym psem był jasny "
        "zimny dzień kwietnia a zegary wybijały trzynaście wszystkie "
        "szczęśliwe rodziny są do siebie podobne to jest opowieść o "
        "ludziach którzy tam mieszkali i o tym co robili ze swoim "
        "czasem rano rybacy nieśli swoje sieci w dół do szarego portu i "
        "czekali aż odwróci się przypływ rynek pachniał świeżym chlebem "
        "i dymem drzewnym podczas gdy dzieci szły powoli do szkoły pod "
        "starą wieżą zegarową nocą gwiazdy obracały się nad cichymi "
        "dachami miasta a rzeka płynęła ciemna i cierpliwa ku dalekiemu "
        "morzu stary człowiek który mieszkał przy drodze mówił że zima "
        "była tutaj zawsze długa i cicha a wiosna przychodziła powoli "
        "przez pola i lasy"
    ),
    "id": (
        "rubah coklat yang cepat melompati anjing yang malas saat itu "
        "hari yang cerah dan dingin di bulan april dan jam jam "
        "berdentang tiga belas kali semua keluarga bahagia itu serupa "
        "ini adalah cerita tentang orang orang yang tinggal di sana dan "
        "hal hal yang mereka lakukan dengan waktu mereka pada pagi hari "
        "para nelayan membawa jala mereka turun ke pelabuhan yang "
        "kelabu dan menunggu air pasang berbalik alun alun pasar berbau "
        "roti segar dan asap kayu sementara anak anak berjalan perlahan "
        "ke sekolah di bawah menara jam yang tua pada malam hari "
        "bintang bintang berputar di atas atap atap kota yang sunyi dan "
        "sungai mengalir gelap dan sabar menuju laut yang jauh"
    ),
    "tr": (
        "hızlı kahverengi tilki tembel köpeğin üzerinden atlar nisan "
        "ayında parlak ve soğuk bir gündü ve saatler on üçü vuruyordu "
        "bütün mutlu aileler birbirine benzer bu orada yaşayan insanlar "
        "ve zamanlarıyla yaptıkları şeyler hakkında bir hikayedir "
        "sabahleyin balıkçılar ağlarını gri limana taşıdılar ve "
        "gelgitin dönmesini beklediler pazar meydanı taze ekmek ve odun "
        "dumanı kokuyordu çocuklar eski saat kulesinin altında okula "
        "yavaş yavaş yürürken geceleyin yıldızlar kasabanın sessiz "
        "çatıları üzerinde dönüyordu ve ırmak uzak denize doğru "
        "karanlık ve sabırlı akıyordu"
    ),
}


def trigram_profiles(k: int = 40) -> dict[str, list[str]]:
    """Top-k trigrams per language from the built-in samples;
    deterministic (count desc, trigram asc)."""
    out: dict[str, list[str]] = {}
    for lang, text in _SAMPLES.items():
        c = Counter(
            text[i:i + 3] for i in range(len(text) - 2)
        )
        out[lang] = [
            t for t, _ in sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        ]
    return out


def lang_id_trigram(
    docs: DataFrame, text_col: str = "text", k: int = 40
) -> DataFrame:
    """(doc_id, lang, score): trigram-profile language ID.  Pure column
    expressions + one broadcast join; 'und' when no profile trigram
    occurs."""
    spark = docs.sparkSession
    profiles = trigram_profiles(k)
    prof = spark.createDataFrame(
        [(lang, t) for lang, ts in sorted(profiles.items()) for t in ts],
        "lang string, tg string",
    )
    # materialize lower(text) ONCE per row: referencing the expression
    # inside the transform lambda re-evaluates it per array element —
    # O(len²) character copying per document (measured 41s → ~1s at
    # sf0.1)
    # fan the single-split scan out BEFORE the explode: the trigram
    # Generate + broadcast-join probe is per-character CPU work that
    # otherwise runs in one scan task (guide §2.5/§6)
    from crawlspark.util import fan_out

    lowered = fan_out(
        docs.select("doc_id", F.lower(F.col(text_col)).alias("_t"))
    )
    t = F.col("_t")
    # guard: sequence(0, -1) would DESCEND in Spark; short texts get an
    # empty index array instead
    idx = F.when(
        F.length(t) >= 3, F.sequence(F.lit(0), F.length(t) - 3)
    ).otherwise(F.array().cast("array<int>"))
    tris = lowered.select(
        "doc_id",
        F.explode(
            F.transform(idx, lambda i: t.substr(i + 1, F.lit(3)))
        ).alias("tg"),
    )
    counts = (
        tris.join(F.broadcast(prof), on="tg")
        .groupBy("doc_id", "lang")
        .agg(F.count(F.lit(1)).alias("score"))
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("lang")
    )
    best = (
        counts.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    return (
        docs.select("doc_id")
        .join(best, on="doc_id", how="left")
        .select(
            "doc_id",
            F.coalesce(F.col("lang"), F.lit("und")).alias("lang"),
            F.coalesce(F.col("score"), F.lit(0)).cast("bigint").alias("score"),
        )
    )


def profiles_values_sql(k: int = 40) -> str:
    """The profile table as a SQL VALUES list for the DuckDB oracle."""
    rows = ", ".join(
        f"('{lang}', '{t}')"
        for lang, ts in sorted(trigram_profiles(k).items())
        for t in ts
    )
    return f"(VALUES {rows}) AS prof(lang, tg)"
