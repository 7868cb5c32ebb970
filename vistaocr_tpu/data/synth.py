"""Synthetic printed-line generator — component C5 (SURVEY.md §2).

The reference ships per-language prep for printed/synthetic MATERIAL data
[L]; the rebuild's generator renders text lines with system TrueType fonts
(DejaVu, which covers Latin + Arabic + Farsi) plus optional degradations,
and is the engine behind BASELINE.json config #1 (CPU-runnable smoke
train) and the Farsi/multilingual printed config #4.

Determinism: everything derives from a numpy Generator seeded by the
caller, so datasets are reproducible artifacts.
"""

from __future__ import annotations

import os
import random
import string
from dataclasses import dataclass, field
from typing import List, Optional, Sequence

import numpy as np
from PIL import Image, ImageDraw, ImageFont

from ..text import utf8_to_uxxxx
from .shards import ShardWriter, write_manifest
from .transforms import height_normalize


def _find_fonts() -> List[str]:
    """Locate usable TTFs. matplotlib ships DejaVu in every env here."""
    candidates = []
    try:
        import matplotlib

        ttf_dir = os.path.join(
            os.path.dirname(matplotlib.__file__), "mpl-data", "fonts", "ttf"
        )
        for name in ("DejaVuSans.ttf", "DejaVuSerif.ttf", "DejaVuSansMono.ttf"):
            p = os.path.join(ttf_dir, name)
            if os.path.exists(p):
                candidates.append(p)
    except ImportError:
        pass
    for p in (
        "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf",
        "/usr/share/fonts/TTF/DejaVuSans.ttf",
    ):
        if os.path.exists(p):
            candidates.append(p)
    return candidates


# Small built-in word lists so the generator needs no corpus files.
_EN_WORDS = (
    "the of and to in is was he for it with as his on be at by had not are but "
    "from or have an they which one you were her all she there would their we "
    "him been has when who will more no if out so said what up its about into "
    "than them can only other new some could time these two may then do first "
    "any my now such like our over man me even most made after also did many "
    "before must through years where much your way well down should because "
    "each just those people how too little state good very make world still "
    "own see men work long get here between both life being under never day "
    "same another know while last might great old year off come since against "
    "go came right used take three"
).split()

_FA_WORDS = (
    "سلام دنیا کتاب مدرسه ایران زبان فارسی روز شب آب نان خانه شهر بزرگ کوچک "
    "مرد زن بچه پدر مادر دوست کار سال ماه هفته دست سر چشم دل راه در باز بسته "
    "خوب بد نو کهنه سفید سیاه سبز آبی سرخ زرد"
).split()

_AR_WORDS = (
    "السلام عليكم كتاب مدرسة لغة عربية يوم ليلة ماء خبز بيت مدينة كبير صغير "
    "رجل امرأة طفل أب أم صديق عمل سنة شهر أسبوع يد رأس عين قلب طريق باب"
).split()

WORD_LISTS = {"en": _EN_WORDS, "fa": _FA_WORDS, "ar": _AR_WORDS}

# Punctuation attachable by sample_text (DejaVu covers all of these).
_PUNCT_TRAIL = [",", ".", ";", ":", "!", "?"]
_PUNCT_WRAP = [("'", "'"), ('"', '"'), ("(", ")")]


def make_vocabulary(n: int = 4000, seed: int = 0, language: str = "en"):
    """Deterministic pseudo-language vocabulary for the open-vocabulary
    quality regime (VERDICT r3: every earlier corpus drew from a closed
    ~143-word list). The first entries are the built-in high-frequency
    function words (rank order matters: SyntheticLineGenerator's Zipf
    draw treats list position as frequency rank); the rest are generated
    content words, deduplicated, same charset as the built-ins.
    Everything derives from the seed, so train/lexicon/OOV splits are
    reproducible artifacts.

    ``language``: "en" builds syllable-model words (onset + nucleus
    [+ coda], 1-3 syllables); "ar"/"fa" build root-and-pattern skeletons
    in standard unvocalized orthography — a 3-consonant root with
    optional long vowels (ا و ي / ا و ی) between radicals plus common
    prefixes (Arabic ال/و/م…, Persian می/بی/نا…) and suffixes (ة/ات/ين,
    ها/ی/ان) — round 5's hard-regime corpora for the RTL rows (VERDICT
    r4 missing #2)."""
    if language in ("ar", "fa"):
        return _make_vocabulary_rtl(n, seed, language)
    rng = np.random.default_rng(seed)
    onsets = ("", "b", "c", "d", "f", "g", "h", "j", "k", "l", "m", "n",
              "p", "r", "s", "t", "v", "w", "z", "br", "ch", "cl", "cr",
              "dr", "fl", "fr", "gr", "pl", "pr", "qu", "sh", "sl", "sp",
              "st", "str", "th", "tr", "wh")
    nuclei = ("a", "e", "i", "o", "u", "ai", "ea", "ee", "io", "ou", "oo")
    codas = ("", "b", "ck", "d", "f", "g", "l", "ll", "m", "n", "nd",
             "ng", "nt", "p", "r", "rd", "rk", "s", "ss", "st", "t", "x")
    words = list(dict.fromkeys(_EN_WORDS))
    seen = set(words)
    while len(words) < n:
        n_syll = int(rng.integers(1, 4))
        parts = []
        for s in range(n_syll):
            parts.append(onsets[int(rng.integers(len(onsets)))])
            parts.append(nuclei[int(rng.integers(len(nuclei)))])
            if s == n_syll - 1 or rng.uniform() < 0.3:
                parts.append(codas[int(rng.integers(len(codas)))])
        w = "".join(parts)
        if len(w) >= 2 and w not in seen:
            seen.add(w)
            words.append(w)
    return words[:n]


_RTL_MORPHOLOGY = {
    # consonant inventory (root radicals), long vowels, prefixes, suffixes
    "ar": (
        list("بتثجحخدذرزسشصضطظعغفقكلمنهي"),
        list("اوي"),
        ("ال", "و", "ب", "لل", "م", "مست"),
        ("ة", "ات", "ين", "ون", "ها", "ي"),
    ),
    "fa": (
        list("بپتثجچحخدذرزژسشصضطظعغفقکگلمنهی"),
        list("اوی"),
        ("می", "بی", "نا", "هم", "بر"),
        ("ها", "ی", "ان", "گر", "ستان", "مند"),
    ),
}


def _make_vocabulary_rtl(n: int, seed: int, language: str):
    """Root-and-pattern word generator for Arabic/Farsi (see
    make_vocabulary). Built-in function words first (frequency rank 0..),
    then generated skeletons; all within DejaVu Sans's Arabic coverage."""
    cons, longs, prefixes, suffixes = _RTL_MORPHOLOGY[language]
    base = _AR_WORDS if language == "ar" else _FA_WORDS
    rng = np.random.default_rng(seed)
    words = list(dict.fromkeys(base))
    seen = set(words)
    while len(words) < n:
        root = [cons[int(rng.integers(len(cons)))] for _ in range(3)]
        w = root[0]
        for c in root[1:]:
            if rng.uniform() < 0.4:
                w += longs[int(rng.integers(len(longs)))]
            w += c
        if rng.uniform() < 0.25:
            w = prefixes[int(rng.integers(len(prefixes)))] + w
        if rng.uniform() < 0.2:
            w = w + suffixes[int(rng.integers(len(suffixes)))]
        if len(w) >= 2 and w not in seen:
            seen.add(w)
            words.append(w)
    return words[:n]


@dataclass
class SynthConfig:
    language: str = "en"  # en | fa | ar | charset
    charset: Optional[str] = None  # used when language == "charset"
    words: Optional[Sequence[str]] = None  # overrides the built-in word list
    min_words: int = 2
    max_words: int = 9
    font_size_range: tuple = (24, 40)
    noise: float = 0.0  # gaussian pixel noise stddev (0-1 scale)
    blur_prob: float = 0.0
    rotate_max_deg: float = 0.0
    # Handwriting-shaped degradations (configs #2/#3 stand-in: the env has
    # no real IAM/MADCAT corpora, so the handwriting preset is exercised
    # on synthetic lines with cursive-like geometry). All prep-time
    # PIL/numpy; see HANDWRITING_DEGRADATIONS below for the tuned set.
    shear_max: float = 0.0  # horizontal slant: x' = x + s*y, s ~ U[-max,max]
    elastic_alpha: float = 0.0  # grid-warp displacement amplitude (px)
    stroke_jitter: float = 0.0  # prob of 3x3 min/max filter (thicken/thin)
    # Open-vocabulary text shaping (VERDICT r3: the hard-regime corpora).
    zipf: bool = False  # Zipf-Mandelbrot word frequencies over `words`
    digit_prob: float = 0.0  # per-token prob of a numeric token instead
    punct_prob: float = 0.0  # per-token prob of attached punctuation
    oov_words: Optional[Sequence[str]] = None  # held-out vocabulary
    oov_rate: float = 0.0  # per-token prob of drawing from oov_words
    # Transcript ordering policy at PREP time (text/bidi.py): CTC labels
    # must be in scan order, so RTL corpora store display-order
    # transcripts (the reference-era MADCAT convention, SURVEY C4).
    # None = auto: True for ar/fa, False otherwise. The round-5 Arabic
    # hard run sat FLAT at 76% CER on logical-order labels (vs 5.8%
    # same-protocol English) — see docs/design.md "Round 5: RTL display
    # order".
    display_order: Optional[bool] = None
    fonts: Sequence[str] = field(default_factory=_find_fonts)

    def stores_display_order(self) -> bool:
        if self.display_order is not None:
            return self.display_order
        return self.language in ("ar", "fa")


# Tuned handwriting-like degradation knobs (used by the corpus-scale
# handwriting-preset run; see docs/design.md quality table).
HANDWRITING_DEGRADATIONS = dict(
    shear_max=0.35,
    elastic_alpha=2.5,
    stroke_jitter=0.6,
    rotate_max_deg=1.5,
    noise=0.03,
    blur_prob=0.3,
    min_words=3,
    max_words=10,
)

# The HARD open-vocabulary regime (VERDICT r3 next-round task 1): heavier
# degradations than the handwriting preset + Zipfian draws from a
# thousands-word vocabulary + digits/punctuation, tuned so a
# budget-limited training run lands in the literature's 3-10% test-CER
# band (BASELINE.md row 5) instead of the closed-list ~0% regime. Pair
# with `words=make_vocabulary(...)`.
OPEN_VOCAB_HARD = dict(
    shear_max=0.45,
    elastic_alpha=3.5,
    stroke_jitter=0.7,
    rotate_max_deg=2.0,
    noise=0.08,
    blur_prob=0.6,
    min_words=3,
    max_words=10,
    zipf=True,
    digit_prob=0.08,
    punct_prob=0.20,
)


def _font_cmap(path: str):
    """Set of codepoints a TTF actually maps (cached). Prevents tofu-box
    rendering: DejaVu Serif/Mono lack Arabic while DejaVu Sans has it."""
    if path not in _font_cmap._cache:
        from fontTools.ttLib import TTFont

        _font_cmap._cache[path] = set(TTFont(path).getBestCmap().keys())
    return _font_cmap._cache[path]


_font_cmap._cache = {}


class SyntheticLineGenerator:
    """Renders (image [H,W] uint8 dark-on-light, text) pairs."""

    def __init__(self, config: SynthConfig, seed: int = 0):
        if not config.fonts:
            raise RuntimeError("no TTF fonts found for synthetic rendering")
        self.config = config
        self.rng = np.random.default_rng(seed)
        self._fonts_cache = {}
        self._zipf_cdf = None
        if config.zipf:
            words = config.words if config.words else WORD_LISTS.get(
                config.language, _EN_WORDS)
            # Zipf-Mandelbrot: p(rank) ∝ 1/(rank + 2.7); list order is
            # rank order (make_vocabulary puts function words first)
            w = 1.0 / (np.arange(len(words)) + 2.7)
            self._zipf_cdf = np.cumsum(w / w.sum())

    def _font(self, path: str, size: int) -> ImageFont.FreeTypeFont:
        key = (path, size)
        if key not in self._fonts_cache:
            self._fonts_cache[key] = ImageFont.truetype(path, size)
        return self._fonts_cache[key]

    def _fonts_covering(self, text: str) -> List[str]:
        cps = {ord(c) for c in text if c != " "}
        good = [p for p in self.config.fonts if cps <= _font_cmap(p)]
        if not good:
            raise ValueError(
                f"no available font covers all glyphs of {text!r}; "
                f"fonts: {[os.path.basename(p) for p in self.config.fonts]}"
            )
        return good

    def sample_text(self) -> str:
        cfg = self.config
        rng = self.rng
        if cfg.language == "charset":
            charset = cfg.charset or (string.ascii_letters + string.digits + " ")
            n = int(rng.integers(8, 40))
            chars = [charset[int(i)] for i in rng.integers(0, len(charset), n)]
            # avoid leading/trailing/double spaces which render invisibly
            text = "".join(chars)
            text = " ".join(text.split())
            return text if text else "a"
        words = cfg.words if cfg.words else WORD_LISTS[cfg.language]
        n = int(rng.integers(cfg.min_words, cfg.max_words + 1))
        picks = []
        for _ in range(n):
            if cfg.oov_rate > 0 and cfg.oov_words and (
                    rng.uniform() < cfg.oov_rate):
                w = cfg.oov_words[int(rng.integers(len(cfg.oov_words)))]
            elif cfg.digit_prob > 0 and rng.uniform() < cfg.digit_prob:
                w = str(int(rng.integers(0, 10 ** int(rng.integers(1, 5)))))
            elif self._zipf_cdf is not None:
                w = words[int(np.searchsorted(self._zipf_cdf, rng.uniform()))]
            else:
                w = words[int(rng.integers(0, len(words)))]
            if cfg.punct_prob > 0 and rng.uniform() < cfg.punct_prob:
                if rng.uniform() < 0.25:
                    a, b = _PUNCT_WRAP[int(rng.integers(len(_PUNCT_WRAP)))]
                    w = a + w + b
                else:
                    w = w + _PUNCT_TRAIL[int(
                        rng.integers(len(_PUNCT_TRAIL)))]
            picks.append(w)
        return " ".join(picks)

    def render(self, text: str, height: int, max_width: Optional[int] = None) -> np.ndarray:
        cfg = self.config
        rng = self.rng
        fonts = self._fonts_covering(text)
        font_path = fonts[int(rng.integers(0, len(fonts)))]
        size = int(rng.integers(cfg.font_size_range[0], cfg.font_size_range[1] + 1))
        font = self._font(font_path, size)

        # Measure, then draw with margin.
        probe = Image.new("L", (8, 8), 255)
        d = ImageDraw.Draw(probe)
        bbox = d.textbbox((0, 0), text, font=font)
        w = max(1, bbox[2] - bbox[0])
        h = max(1, bbox[3] - bbox[1])
        pad = max(2, size // 6)
        img = Image.new("L", (w + 2 * pad, h + 2 * pad), 255)
        ImageDraw.Draw(img).text((pad - bbox[0], pad - bbox[1]), text, font=font, fill=0)

        if cfg.shear_max > 0:
            # Slant: output (x, y) samples input (x + s*y + c, y); c keeps
            # the sheared content inside the widened frame for either sign.
            s = float(rng.uniform(-cfg.shear_max, cfg.shear_max))
            w0, h0 = img.size
            c = -max(s, 0.0) * h0
            img = img.transform(
                (w0 + int(abs(s) * h0) + 1, h0), Image.AFFINE,
                (1.0, s, c, 0.0, 1.0, 0.0),
                resample=Image.BILINEAR, fillcolor=255,
            )

        if cfg.elastic_alpha > 0:
            img = Image.fromarray(self._elastic_warp(
                np.asarray(img, np.float32), cfg.elastic_alpha
            ))

        if cfg.stroke_jitter > 0 and rng.uniform() < cfg.stroke_jitter:
            from PIL import ImageFilter

            # dark-on-light: MinFilter thickens strokes, MaxFilter thins
            img = img.filter(
                ImageFilter.MinFilter(3) if rng.uniform() < 0.5
                else ImageFilter.MaxFilter(3)
            )

        if cfg.rotate_max_deg > 0:
            angle = float(rng.uniform(-cfg.rotate_max_deg, cfg.rotate_max_deg))
            img = img.rotate(angle, resample=Image.BILINEAR, expand=True, fillcolor=255)

        arr = height_normalize(np.asarray(img, dtype=np.uint8), height, max_width=max_width)

        if cfg.blur_prob > 0 and rng.uniform() < cfg.blur_prob:
            from PIL import ImageFilter

            arr = np.asarray(
                Image.fromarray(arr).filter(ImageFilter.GaussianBlur(radius=0.7)),
                dtype=np.uint8,
            )
        if cfg.noise > 0:
            noise = rng.normal(0.0, cfg.noise * 255.0, arr.shape)
            arr = np.clip(arr.astype(np.float32) + noise, 0, 255).astype(np.uint8)
        return arr

    def _elastic_warp(self, arr: np.ndarray, alpha: float) -> np.ndarray:
        """Grid-distortion elastic warp: random offsets on a coarse grid,
        bilinearly upsampled to a smooth displacement field, then bilinear
        backward sampling. numpy-only (no scipy in this environment)."""
        rng = self.rng
        h0, w0 = arr.shape
        gh, gw = max(2, h0 // 12), max(2, w0 // 24)
        fields = []
        for _ in range(2):
            coarse = rng.uniform(-1.0, 1.0, (gh, gw)).astype(np.float32)
            fields.append(np.asarray(
                Image.fromarray(coarse * alpha, mode="F").resize(
                    (w0, h0), Image.BILINEAR
                )
            ))
        dx, dy = fields
        ys, xs = np.meshgrid(
            np.arange(h0, dtype=np.float32),
            np.arange(w0, dtype=np.float32),
            indexing="ij",
        )
        sx = np.clip(xs + dx, 0, w0 - 1)
        sy = np.clip(ys + dy, 0, h0 - 1)
        x0 = np.floor(sx).astype(np.int32)
        y0 = np.floor(sy).astype(np.int32)
        x1 = np.minimum(x0 + 1, w0 - 1)
        y1 = np.minimum(y0 + 1, h0 - 1)
        fx = sx - x0
        fy = sy - y0
        out = (
            arr[y0, x0] * (1 - fx) * (1 - fy)
            + arr[y0, x1] * fx * (1 - fy)
            + arr[y1, x0] * (1 - fx) * fy
            + arr[y1, x1] * fx * fy
        )
        return np.clip(out, 0, 255).astype(np.uint8)

    def sample(self, height: int, max_width: Optional[int] = None):
        text = self.sample_text()
        return self.render(text, height, max_width=max_width), text


def build_synthetic_dataset(
    dataset_dir: str,
    *,
    num_train: int = 512,
    num_val: int = 64,
    num_test: int = 0,
    height: int = 32,
    max_width: Optional[int] = 1024,
    config: Optional[SynthConfig] = None,
    seed: int = 0,
) -> str:
    """Render a full dataset into the shard-store format. Returns dataset_dir."""
    cfg = config or SynthConfig()
    splits = {}
    counts = {"train": num_train, "val": num_val, "test": num_test}
    for split_i, (split, n) in enumerate(counts.items()):
        if n <= 0:
            continue
        gen = SyntheticLineGenerator(cfg, seed=seed * 1000 + split_i)
        writer = ShardWriter(dataset_dir, split, height)
        to_display = cfg.stores_display_order()
        if to_display:
            from ..text.bidi import display_order as _disp
        for i in range(n):
            img, text = gen.sample(height, max_width=max_width)
            if to_display:
                text = _disp(text)
            writer.add(f"{split}-{i:06d}", img, utf8_to_uxxxx(text))
        splits[split] = writer.close()
    write_manifest(
        dataset_dir,
        height,
        splits,
        extra={"source": "synthetic", "language": cfg.language, "seed": seed,
               "transcript_order": (
                   "display" if cfg.stores_display_order() else "logical")},
    )
    return dataset_dir


def main(argv=None):
    """CLI: python -m vistaocr_tpu.data.synth --out <dir> --language fa ..."""
    import argparse

    p = argparse.ArgumentParser(description="Render a synthetic line dataset")
    p.add_argument("--out", required=True)
    p.add_argument("--language", default="en", choices=("en", "fa", "ar", "charset"))
    p.add_argument("--charset", default=None)
    p.add_argument("--num-train", type=int, default=2048)
    p.add_argument("--num-val", type=int, default=256)
    p.add_argument("--num-test", type=int, default=256)
    p.add_argument("--height", type=int, default=32)
    p.add_argument("--max-width", type=int, default=1024)
    p.add_argument("--noise", type=float, default=0.0)
    p.add_argument("--blur-prob", type=float, default=0.0)
    p.add_argument("--rotate-max-deg", type=float, default=0.0)
    p.add_argument("--handwriting", action="store_true",
                   help="apply the tuned handwriting-shaped degradation "
                        "set (slant + elastic warp + stroke jitter + noise)")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)
    kw = dict(
        language=args.language,
        charset=args.charset,
        noise=args.noise,
        blur_prob=args.blur_prob,
        rotate_max_deg=args.rotate_max_deg,
    )
    if args.handwriting:
        kw.update(HANDWRITING_DEGRADATIONS)
    cfg = SynthConfig(**kw)
    build_synthetic_dataset(
        args.out,
        num_train=args.num_train,
        num_val=args.num_val,
        num_test=args.num_test,
        height=args.height,
        max_width=args.max_width,
        config=cfg,
        seed=args.seed,
    )
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
