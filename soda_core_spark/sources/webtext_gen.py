"""Deterministic synthetic ``web_pages`` table (FIXTURES.md F1, authoritative
shape from BASELINE.json input_hint):

    url:string, warc_ts:timestamp, html:binary, text:string, lang:string

Properties engineered into the data:

* host drawn from a Zipf distribution over ~50 hosts (a few hosts get
  ~100× the mass) — exercises salted repartitioning / AQE skew handling,
* text mixture: clean English, short stubs, symbol junk, high-repetition
  boilerplate, non-English (de/fr/es), and PII/toxicity-laden docs — every
  filter rule has positive and negative examples,
* ``lang`` agrees with the text ~95% of the time, deliberately wrong ~5%
  (exercises langid-disagreement rules),
* fully deterministic: ``numpy.random.default_rng(seed)``, seed=42.

Everything is generated locally — no external data.
"""

from __future__ import annotations

import os
from datetime import datetime, timezone

import numpy as np
import pandas as pd

SEED = 42
BASE_TS = datetime(2026, 6, 1, tzinfo=timezone.utc)
WINDOW_S = 30 * 24 * 3600

N_HOSTS = 50

# --- sentence pools (written for this repo; overlap with the perplexity
# seed corpus is intentional — clean docs must score fluent) -----------------

_CLEAN_SENTENCES = [
    "The quick brown fox jumps over the lazy dog and runs across the field.",
    "She walked along the narrow road between the old houses and the hills.",
    "The sun rose slowly over the quiet village as the river ran to the sea.",
    "Knowledge speaks but wisdom listens and time passes for every living thing.",
    "The rain fell softly on the roof while the children slept through the night.",
    "Every great journey begins with a single step taken in hope and courage.",
    "The history of science is the history of ideas tested against observation.",
    "There are more things in heaven and earth than we can easily explain.",
    "He found the old letter in the drawer and read it slowly by the window.",
    "The market opened early and the streets filled with people and noise.",
    "A long road runs from the mountains down to the valley and the sea.",
    "They gathered wood for the fire and told stories late into the evening.",
    "The teacher asked a simple question and waited for the class to think.",
    "In the morning the fog lifted and the whole coast was clear and bright.",
    "The library was quiet except for the turning of pages and soft steps.",
    "We planted the garden in spring and watched it grow through the summer.",
]

_STUB_TEXTS = [
    "Click here to continue.",
    "Page not found.",
    "Loading, please wait...",
    "Accept cookies to proceed.",
    "Buy now! Limited offer!",
    "Subscribe for more.",
    "404 error",
    "Home | About | Contact",
]

_DE_SENTENCES = [
    "Der alte Mann ging langsam durch die Stadt und sah die vielen Lichter.",
    "Die Kinder spielten im Garten und waren mit dem Wetter sehr zufrieden.",
    "Es ist nicht leicht eine neue Sprache zu lernen aber es lohnt sich.",
    "Am Morgen war der Himmel klar und die Sonne schien auf die Felder.",
    "Sie hat das Buch gelesen und konnte nicht aufhören daran zu denken.",
    "Wir sind gestern mit dem Zug in die Berge gefahren und viel gewandert.",
    "Das Wasser im See war noch kalt aber die Luft war schon warm.",
    "Er hat lange an dem Brief geschrieben und ihn dann doch nicht geschickt.",
    "In der Nacht fiel der erste Schnee und am Morgen war alles weiß.",
    "Die alte Brücke über den Fluss wurde im letzten Jahr neu gebaut.",
    "Man kann von hier aus die ganze Stadt und den Hafen sehen.",
    "Nach dem Essen gingen wir noch lange am Ufer entlang spazieren.",
]

_FR_SENTENCES = [
    "Le vieux port était calme et les bateaux attendaient le retour du vent.",
    "Elle a ouvert la fenêtre pour regarder la pluie tomber sur les toits.",
    "Il ne faut pas beaucoup de choses pour être heureux dans la vie.",
    "Nous avons marché le long de la rivière jusqu'à la tombée de la nuit.",
    "Les enfants sont allés à l'école avec leurs amis ce matin très tôt.",
    "La lumière du soir entrait doucement par la porte restée ouverte.",
    "Il a posé son livre sur la table et regardé le feu un long moment.",
    "Le marché du samedi remplit la place de couleurs et de voix.",
    "Nous avons pris la vieille route qui monte vers les collines.",
    "Elle se souvient encore du jardin de sa grand-mère en été.",
    "Le train est parti en retard mais il est arrivé à l'heure.",
    "On entendait au loin les cloches de la petite église du village.",
]

_ES_SENTENCES = [
    "El sol salió temprano y la ciudad despertó con el ruido de la calle.",
    "No es fácil aprender un idioma nuevo pero vale la pena el esfuerzo.",
    "Los niños jugaban en el parque mientras sus padres hablaban del viaje.",
    "Ella leyó la carta despacio y luego miró por la ventana un largo rato.",
    "En la montaña el aire es limpio y el agua baja fría desde la nieve.",
    "Caminamos por la orilla del río hasta que se hizo de noche.",
    "La casa de mi abuela tenía un patio lleno de flores y de luz.",
    "El tren salió con retraso pero llegamos a tiempo a la estación.",
    "Después de la lluvia el campo olía a tierra mojada y a hierba.",
    "Me gusta leer un rato antes de dormir cuando la casa está en silencio.",
    "El mercado de los domingos llena la plaza de gente y de colores.",
    "Desde la torre se puede ver todo el valle y el camino al mar.",
]

_PII_SNIPPETS = [
    "Contact me at john.doe@example.com for details.",
    "Call +1-555-867-5309 before noon.",
    "My SSN is 123-45-6789 do not share it.",
    "Server at 192.168.10.44 went down again.",
    "Card 4111-1111-1111-1111 was declined.",
    "That frakking printer is broken again.",
    "What a gorram mess this deployment is.",
    "Email support@shop-example.org or call (555) 123-4567.",
]

_SYMBOLS = list("!@#$%^&*()[]{}<>/\\|~`+=;:,.-_0123456789")

CATEGORIES = ("clean", "stub", "junk", "repeat", "non_en", "pii")
_CATEGORY_P = (0.50, 0.08, 0.08, 0.09, 0.15, 0.10)
_NON_EN = (
    ("de", _DE_SENTENCES),
    ("fr", _FR_SENTENCES),
    ("es", _ES_SENTENCES),
)


def _zipf_host_ids(rng: np.random.Generator, n: int) -> np.ndarray:
    ranks = np.arange(1, N_HOSTS + 1, dtype=np.float64)
    p = 1.0 / ranks**1.2
    p /= p.sum()
    return rng.choice(N_HOSTS, size=n, p=p)


def _make_text(rng: np.random.Generator, category: str) -> tuple[str, str]:
    """Returns (text, true_lang)."""
    if category == "clean":
        # without replacement: whole-sentence repeats would trip the
        # bigram-repetition rule on docs meant to be kept
        k = int(rng.integers(5, 13))
        idx = rng.choice(len(_CLEAN_SENTENCES), size=k, replace=False)
        return " ".join(_CLEAN_SENTENCES[i] for i in idx), "en"
    if category == "stub":
        return _STUB_TEXTS[int(rng.integers(0, len(_STUB_TEXTS)))], "en"
    if category == "junk":
        k = int(rng.integers(220, 900))
        chars = rng.choice(_SYMBOLS, size=k)
        # sprinkle spaces so it still tokenizes into "words"
        out = []
        for i, c in enumerate(chars):
            out.append(str(c))
            if i % 7 == 6:
                out.append(" ")
        return "".join(out), "en"
    if category == "repeat":
        s = _CLEAN_SENTENCES[int(rng.integers(0, len(_CLEAN_SENTENCES)))]
        k = int(rng.integers(8, 25))
        return " ".join([s] * k), "en"
    if category == "non_en":
        lang, pool = _NON_EN[int(rng.integers(0, len(_NON_EN)))]
        k = int(rng.integers(5, min(11, len(pool))))
        idx = rng.choice(len(pool), size=k, replace=False)
        return " ".join(pool[i] for i in idx), lang
    if category == "pii":
        k = int(rng.integers(5, 12))
        idx = rng.choice(len(_CLEAN_SENTENCES), size=k, replace=False)
        parts = [_CLEAN_SENTENCES[i] for i in idx]
        n_pii = int(rng.integers(1, 4))
        for _ in range(n_pii):
            pos = int(rng.integers(0, len(parts) + 1))
            parts.insert(pos, _PII_SNIPPETS[int(rng.integers(0, len(_PII_SNIPPETS)))])
        return " ".join(parts), "en"
    raise ValueError(category)


def generate_web_pages(
    n_rows: int, seed: int = SEED, start_index: int = 0
) -> pd.DataFrame:
    """Deterministic pandas frame with the authoritative column shape.
    ``start_index`` offsets the url numbering so multi-file generation
    yields globally-unique urls."""
    rng = np.random.default_rng(seed)
    host_ids = _zipf_host_ids(rng, n_rows)
    cat_idx = rng.choice(len(CATEGORIES), size=n_rows, p=_CATEGORY_P)
    ts_off = rng.integers(0, WINDOW_S, size=n_rows)
    wrong_lang = rng.random(n_rows) < 0.05
    lang_pool = ["en", "de", "fr", "es", "it", "nl"]

    urls, texts, langs, htmls = [], [], [], []
    for i in range(n_rows):
        cat = CATEGORIES[cat_idx[i]]
        text, true_lang = _make_text(rng, cat)
        lang = true_lang
        if wrong_lang[i]:
            others = [l for l in lang_pool if l != true_lang]
            lang = others[int(rng.integers(0, len(others)))]
        host = f"host{host_ids[i]:02d}.example.com"
        urls.append(f"https://{host}/{cat}/page-{start_index + i:08d}.html")
        texts.append(text)
        langs.append(lang)
        html_len = int(rng.integers(256, 2048))
        htmls.append(rng.bytes(html_len))

    ts = pd.to_datetime(
        np.datetime64(BASE_TS.replace(tzinfo=None)) + ts_off.astype("timedelta64[s]")
    )
    return pd.DataFrame(
        {
            "url": pd.array(urls, dtype="string"),
            "warc_ts": ts,
            "html": htmls,
            "text": pd.array(texts, dtype="string"),
            "lang": pd.array(langs, dtype="string"),
        }
    )


def write_web_pages_parquet(
    path: str,
    n_rows: int,
    seed: int = SEED,
    rows_per_file: int = 100_000,
    row_group_size: int = 4096,
) -> str:
    """Write the table as a multi-file parquet dataset with SMALL row
    groups. Spark's input splits must align to row-group boundaries —
    one giant row group per file caps parallelism at the file count no
    matter how many cores exist (this exact mistake made local[8] ==
    local[32]). ~4k-row groups give every core real work. Idempotent on
    (path, n_rows, seed) via a marker file."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    marker = os.path.join(path, f"_GENERATED_{n_rows}_{seed}_rg{row_group_size}")
    if os.path.exists(marker):
        return path
    os.makedirs(path, exist_ok=True)
    for f in os.listdir(path):
        if f.endswith(".parquet") or f.startswith("_GENERATED_"):
            os.remove(os.path.join(path, f))
    part = 0
    for start in range(0, n_rows, rows_per_file):
        cnt = min(rows_per_file, n_rows - start)
        # one rng stream per file, derived from (seed, part) → deterministic
        # regardless of rows_per_file-vs-total split
        pdf = generate_web_pages(cnt, seed=seed * 1_000_003 + part, start_index=start)
        table = pa.Table.from_pandas(pdf, preserve_index=False)
        pq.write_table(
            table,
            os.path.join(path, f"part-{part:05d}.parquet"),
            row_group_size=row_group_size,
        )
        part += 1
    with open(marker, "w") as fh:
        fh.write("ok")
    return path
