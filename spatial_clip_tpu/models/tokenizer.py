"""Tokenizers for gene sentences and natural-language captions.

The reference uses a byte-level BPE ``SimpleTokenizer`` over the OpenAI CLIP
vocab (ref: src/open_clip/tokenizer.py:133-269, ``tokenize`` :276). We provide:

- ``SimpleTokenizer``: a from-scratch byte-BPE implementation. The merges
  file (``bpe_simple_vocab_16e6.txt.gz``, a public OpenAI data asset) is
  vendored next to this module; ``bpe_path=`` or ``$SPATIAL_CLIP_BPE_PATH``
  override it.
- ``GeneTokenizer``: closed-vocabulary tokenizer over a gene-symbol list
  (e.g. ``global_hvgs.txt``) — the natural tokenizer for "gene sentences"
  (space-separated top-k expressed gene symbols), with one token per gene.
- ``HashTokenizer``: dependency-free fallback hashing whitespace tokens into
  the vocab; used for smoke tests and synthetic data.

All tokenizers are callables ``texts -> np.ndarray[int32] (B, context_length)``
— the array-first equivalent of the reference's tensor contract.
"""
from __future__ import annotations

import gzip
import html
import os
import re
import string
from functools import lru_cache
from pathlib import Path
from typing import Iterable, List, Optional, Sequence, Union

import numpy as np

DEFAULT_CONTEXT_LENGTH = 77


@lru_cache()
def bytes_to_unicode():
    """Reversible byte <-> printable-unicode map (GPT-2 byte-level BPE)."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("\xa1"), ord("\xac") + 1))
        + list(range(ord("\xae"), ord("\xff") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def get_pairs(word):
    pairs = set()
    prev = word[0]
    for ch in word[1:]:
        pairs.add((prev, ch))
        prev = ch
    return pairs


def basic_clean(text: str) -> str:
    text = html.unescape(html.unescape(text))
    return text.strip()


def whitespace_clean(text: str) -> str:
    return re.sub(r"\s+", " ", text).strip()


def canonicalize_text(text: str) -> str:
    """The open_clip 'lower' clean used by SimpleTokenizer (ref
    tokenizer.py:79-81 _clean_lower): HTML-unescape, whitespace collapse,
    lowercase. NOTE: the big_vision punctuation-stripping canonicalization
    (ref tokenizer.py:104-129) is ``SigLipTokenizer.canonicalize`` — it must
    NOT be applied here or byte-BPE bit parity breaks
    (tests/test_torch_parity.py::test_bpe_bit_parity_vs_reference)."""
    return whitespace_clean(basic_clean(text)).lower()


def _resolve_bpe_path(bpe_path: Optional[str]) -> Optional[Path]:
    if bpe_path:
        return Path(bpe_path)
    env = os.environ.get("SPATIAL_CLIP_BPE_PATH")
    if env:
        return Path(env)
    # vendored public OpenAI CLIP merges (a data asset, same compat-contract
    # status as models/model_configs/*.json; ref ships the identical file at
    # src/open_clip/bpe_simple_vocab_16e6.txt.gz)
    vendored = Path(__file__).parent / "bpe_simple_vocab_16e6.txt.gz"
    return vendored if vendored.exists() else None


class SimpleTokenizer:
    """Byte-level BPE tokenizer (CLIP-compatible when given the CLIP merges).

    Vocabulary layout matches the reference (ref: tokenizer.py:133-180):
    256 byte symbols, 256 end-of-word symbols, merge tokens, then
    ``<start_of_text>``/``<end_of_text>`` special tokens.
    """

    WORD_PATTERN = (
        r"<start_of_text>|<end_of_text>|'s|'t|'re|'ve|'m|'ll|'d|"
        r"[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+"
    )

    def __init__(
        self,
        bpe_path: Optional[str] = None,
        context_length: int = DEFAULT_CONTEXT_LENGTH,
        n_merges: int = 48894,
    ):
        path = _resolve_bpe_path(bpe_path)
        if path is None or not path.exists():
            raise FileNotFoundError(
                "SimpleTokenizer needs a BPE merges file; pass bpe_path= or set "
                "$SPATIAL_CLIP_BPE_PATH (e.g. the public CLIP "
                "bpe_simple_vocab_16e6.txt.gz). For gene sentences use "
                "GeneTokenizer instead."
            )
        self.context_length = context_length
        self.byte_encoder = bytes_to_unicode()
        self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}

        opener = gzip.open if str(path).endswith(".gz") else open
        with opener(path, "rt", encoding="utf-8") as f:
            lines = f.read().split("\n")
        # first line is a version header; merge list is capped like the ref
        merges = [tuple(l.split()) for l in lines[1 : n_merges + 1] if l.strip()]

        vocab = list(self.byte_encoder.values())
        vocab = vocab + [v + "</w>" for v in vocab]
        vocab.extend("".join(m) for m in merges)
        vocab.extend(["<start_of_text>", "<end_of_text>"])
        self.encoder = {tok: i for i, tok in enumerate(vocab)}
        self.decoder = {i: tok for tok, i in self.encoder.items()}
        self.bpe_ranks = {m: i for i, m in enumerate(merges)}
        self.cache = {
            "<start_of_text>": "<start_of_text>",
            "<end_of_text>": "<end_of_text>",
        }
        try:
            import regex

            self.pat = regex.compile(self.WORD_PATTERN, regex.IGNORECASE)
            self._findall = self.pat.findall
        except ImportError:  # pragma: no cover - regex ships with transformers
            pat = re.compile(
                r"<start_of_text>|<end_of_text>|'s|'t|'re|'ve|'m|'ll|'d|"
                r"[a-zA-Z]+|[0-9]|[^\sa-zA-Z0-9]+",
                re.IGNORECASE,
            )
            self._findall = pat.findall
        self.sot_token = self.encoder["<start_of_text>"]
        self.eot_token = self.encoder["<end_of_text>"]
        self.vocab_size = len(self.encoder)

    def bpe(self, token: str) -> str:
        if token in self.cache:
            return self.cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        pairs = get_pairs(word)
        if not pairs:
            return token + "</w>"
        while True:
            bigram = min(pairs, key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word: List[str] = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                except ValueError:
                    new_word.extend(word[i:])
                    break
                new_word.extend(word[i:j])
                i = j
                if i < len(word) - 1 and word[i] == first and word[i + 1] == second:
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = get_pairs(word)
        out = " ".join(word)
        self.cache[token] = out
        return out

    def encode(self, text: str) -> List[int]:
        ids: List[int] = []
        text = canonicalize_text(text)
        for tok in self._findall(text):
            tok = "".join(self.byte_encoder[b] for b in tok.encode("utf-8"))
            ids.extend(self.encoder[t] for t in self.bpe(tok).split(" "))
        return ids

    def decode(self, ids: Iterable[int]) -> str:
        text = "".join(self.decoder[int(i)] for i in ids)
        raw = bytearray(self.byte_decoder[c] for c in text if c in self.byte_decoder)
        return raw.decode("utf-8", errors="replace").replace("</w>", " ")

    def __call__(
        self, texts: Union[str, Sequence[str]], context_length: Optional[int] = None
    ) -> np.ndarray:
        if isinstance(texts, str):
            texts = [texts]
        L = context_length or self.context_length
        out = np.zeros((len(texts), L), dtype=np.int32)
        for i, text in enumerate(texts):
            ids = [self.sot_token] + self.encode(text)[: L - 2] + [self.eot_token]
            out[i, : len(ids)] = ids
        return out


class GeneTokenizer:
    """One-token-per-gene tokenizer over a fixed gene vocabulary.

    Gene sentences are space-separated HGNC symbols ordered by expression rank
    (ref: src/spaglam_preproc/core/gene_encoder.py:5-29); a closed vocab with
    one id per symbol preserves all information with zero BPE overhead.

    id layout: 0=<pad>, 1=<sot>, 2=<eot>, 3=<unk>, gene_i -> 4+i.
    ``vocab_size`` is padded up to a multiple of 128 for MXU-friendly
    embedding tables.
    """

    PAD, SOT, EOT, UNK = 0, 1, 2, 3
    N_SPECIAL = 4

    def __init__(
        self,
        genes: Union[str, Path, Sequence[str]],
        context_length: int = DEFAULT_CONTEXT_LENGTH,
        pad_vocab_to_multiple: int = 128,
    ):
        if isinstance(genes, (str, Path)):
            with open(genes) as f:
                genes = [line.strip() for line in f if line.strip()]
        self.genes = list(genes)
        self.gene_to_id = {
            g.upper(): i + self.N_SPECIAL for i, g in enumerate(self.genes)
        }
        self.context_length = context_length
        raw = self.N_SPECIAL + len(self.genes)
        m = pad_vocab_to_multiple
        self.vocab_size = ((raw + m - 1) // m) * m
        self.sot_token = self.SOT
        self.eot_token = self.EOT

    def encode(self, text: str) -> List[int]:
        return [
            self.gene_to_id.get(tok.upper(), self.UNK)
            for tok in whitespace_clean(basic_clean(text)).split(" ")
            if tok
        ]

    def decode(self, ids: Iterable[int]) -> str:
        inv = {v: k for k, v in self.gene_to_id.items()}
        return " ".join(inv[int(i)] for i in ids if int(i) in inv)

    def __call__(
        self, texts: Union[str, Sequence[str]], context_length: Optional[int] = None
    ) -> np.ndarray:
        if isinstance(texts, str):
            texts = [texts]
        L = context_length or self.context_length
        out = np.zeros((len(texts), L), dtype=np.int32)
        for i, text in enumerate(texts):
            ids = [self.SOT] + self.encode(text)[: L - 2] + [self.EOT]
            out[i, : len(ids)] = ids
        return out


class GeneVectorizer:
    """Gene sentence -> rank-weighted expression vector (B, num_genes).

    The "tokenizer" for the GeneMLP tower (north-star config 1): weight
    ``1 - 0.8 * rank / n`` per expressed gene, matching the reference's
    zero-shot target construction (ref: src/metrics/zero_shot.py:27-60) so
    the tower consumes exactly the representation the metric evaluates.
    """

    def __init__(self, genes: Union[str, Path, Sequence[str]], pad_to_multiple: int = 0):
        if isinstance(genes, (str, Path)):
            with open(genes) as f:
                genes = [line.strip() for line in f if line.strip()]
        self.genes = list(genes)
        self.gene_to_idx = {g.upper(): i for i, g in enumerate(self.genes)}
        n = len(self.genes)
        if pad_to_multiple:
            n = ((n + pad_to_multiple - 1) // pad_to_multiple) * pad_to_multiple
        self.num_genes = n
        self.context_length = n  # for shape-introspecting callers

    def __call__(
        self, texts: Union[str, Sequence[str]], context_length: Optional[int] = None
    ) -> np.ndarray:
        if isinstance(texts, str):
            texts = [texts]
        out = np.zeros((len(texts), self.num_genes), dtype=np.float32)
        for i, text in enumerate(texts):
            toks = [t for t in whitespace_clean(basic_clean(text)).split(" ") if t]
            n = len(toks)
            for rank, tok in enumerate(toks):
                idx = self.gene_to_idx.get(tok.upper())
                if idx is not None:
                    out[i, idx] = 1.0 - (0.8 * rank / max(n, 1))
        return out


class HashTokenizer:
    """Deterministic hashing tokenizer — no vocab asset required.

    Maps whitespace tokens into ``[n_special, vocab_size)`` buckets with a
    stable FNV-1a hash. Used as the default fallback so the framework runs
    standalone; swap in SimpleTokenizer/GeneTokenizer for production.
    """

    PAD, SOT, EOT = 0, 1, 2
    N_SPECIAL = 4

    def __init__(
        self, vocab_size: int = 49408, context_length: int = DEFAULT_CONTEXT_LENGTH
    ):
        self.vocab_size = vocab_size
        self.context_length = context_length
        self.sot_token = self.SOT
        self.eot_token = self.EOT

    @staticmethod
    def _fnv1a(s: str) -> int:
        h = 0xCBF29CE484222325
        for b in s.encode("utf-8"):
            h ^= b
            h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
        return h

    def encode(self, text: str) -> List[int]:
        span = self.vocab_size - self.N_SPECIAL
        return [
            self.N_SPECIAL + self._fnv1a(tok) % span
            for tok in canonicalize_text(text).split(" ")
            if tok
        ]

    def __call__(
        self, texts: Union[str, Sequence[str]], context_length: Optional[int] = None
    ) -> np.ndarray:
        if isinstance(texts, str):
            texts = [texts]
        L = context_length or self.context_length
        out = np.zeros((len(texts), L), dtype=np.int32)
        for i, text in enumerate(texts):
            ids = [self.SOT] + self.encode(text)[: L - 2] + [self.EOT]
            out[i, : len(ids)] = ids
        return out


# ---------------------------------------------------------------- POS-lite
# Lightweight part-of-speech priority heuristic for the ``syntax`` reduction
# mask (ref: tokenizer.py:331-404 syntax_mask_tokenize uses nltk's
# averaged-perceptron tagger with priority NN < JJ < VB < other; nltk and
# its model downloads are unavailable offline, so we vendor a closed-class
# word list + suffix heuristic with the same priority contract: unknown
# words default to noun — exactly nltk's own fallback for OOV tokens).

_POS_FUNCTION_WORDS = frozenset(
    """a an the this that these those some any each every no another
    i you he she it we they me him her us them my your his its our their
    mine yours hers ours theirs myself yourself himself herself itself
    ourselves themselves who whom whose which what
    in on at by for with about against between into through during before
    after above below to from up down out off over under again further of
    near beside behind beneath along across around without within upon
    and or but nor so yet if because as until while unless than whether
    is am are was were be been being do does did doing have has had having
    will would shall should may might must can could
    not only own same too very just also there here when where why how
    all both few more most other such""".split()
)
_POS_ADJ_SUFFIXES = (
    "able", "ible", "al", "ful", "ic", "ive", "less", "ous", "ish",
    "ary", "est", "ant", "ent",
)
_POS_VERB_SUFFIXES = ("ing", "ed", "ize", "ise", "ify", "ate", "en")


def _pos_priority(word: str) -> int:
    """1 = noun, 2 = adjective, 3 = verb, 4 = other (drop first)."""
    w = word.lower()
    if not any(c.isalpha() for c in w):
        return 4  # punctuation / numerals
    if w in _POS_FUNCTION_WORDS:
        return 4
    for suf in _POS_ADJ_SUFFIXES:
        if w.endswith(suf) and len(w) > len(suf) + 2:
            return 2
    for suf in _POS_VERB_SUFFIXES:
        if w.endswith(suf) and len(w) > len(suf) + 2:
            return 3
    return 1  # noun by default (nltk's OOV fallback is NN as well)


_WORD_RE = re.compile(r"\w+|[^\w\s]")


class ReductionTokenizer:
    """Mask-reduction tokenizer wrapper (ref: tokenizer.py:280-404
    random/simple/shuffle/syntax mask variants): when a text over-fills the
    context, keep a subset (``random``: sorted random subset, ``shuffle``:
    unsorted, ``simple``: random contiguous crop, ``syntax``: words ranked
    noun < adj < verb < other by the vendored POS-lite heuristic, original
    order preserved) instead of truncating.
    Wraps any base tokenizer exposing ``encode``/``sot_token``/``eot_token``.
    """

    def __init__(self, base, reduction: str = "random", seed: int = 0):
        if reduction not in ("random", "shuffle", "simple", "syntax"):
            raise ValueError(f"unknown reduction mask: {reduction}")
        self.base = base
        self.reduction = reduction
        self.rng = np.random.default_rng(seed)
        self.context_length = base.context_length
        self.vocab_size = getattr(base, "vocab_size", None)

    def _syntax_reduce(self, text: str, keep: int) -> str:
        """Word-level reduction (the reference reduces WORDS, then
        re-encodes the joined text — some words still expand to 2+ tokens,
        so a final token-level truncate applies downstream)."""
        words = _WORD_RE.findall(text)
        if len(words) <= keep:
            return text
        order = np.array([_pos_priority(w) for w in words])
        # stable sort: among equal priorities, earlier words win (ref
        # np.argsort default quicksort is unstable; stable matches the
        # sorted(sorted_ids[:n]) intent deterministically)
        sel = np.sort(np.argsort(order, kind="stable")[:keep])
        return " ".join(words[j] for j in sel)

    def __call__(
        self, texts: Union[str, Sequence[str]], context_length: Optional[int] = None
    ) -> np.ndarray:
        if isinstance(texts, str):
            texts = [texts]
        L = context_length or self.context_length
        out = np.zeros((len(texts), L), dtype=np.int32)
        for i, text in enumerate(texts):
            if self.reduction == "syntax":
                text = self._syntax_reduce(text, L - 2)
            ids = self.base.encode(text)
            keep = L - 2
            if len(ids) > keep:
                if self.reduction in ("random", "shuffle"):
                    idx = self.rng.permutation(len(ids))[:keep]
                    if self.reduction == "random":
                        idx = np.sort(idx)
                    ids = [ids[j] for j in idx]
                elif self.reduction == "syntax":
                    # words were already priority-reduced; some expand to
                    # 2+ tokens — final truncate (ref tokenizer.py:380-384)
                    ids = ids[:keep]
                else:  # simple: random contiguous crop
                    start = int(self.rng.integers(0, len(ids) - keep + 1))
                    ids = ids[start : start + keep]
            row = [self.base.sot_token] + list(ids) + [self.base.eot_token]
            out[i, : len(row)] = row
        return out


class HFTokenizer:
    """HuggingFace tokenizer adapter (ref: tokenizer.py:405-460)."""

    def __init__(
        self, tokenizer_name: str, context_length: int = DEFAULT_CONTEXT_LENGTH, **kwargs
    ):
        from transformers import AutoTokenizer

        self.tokenizer = AutoTokenizer.from_pretrained(tokenizer_name, **kwargs)
        self.context_length = context_length
        self.vocab_size = self.tokenizer.vocab_size

    def __call__(
        self, texts: Union[str, Sequence[str]], context_length: Optional[int] = None
    ) -> np.ndarray:
        if isinstance(texts, str):
            texts = [texts]
        L = context_length or self.context_length
        enc = self.tokenizer(
            list(texts),
            return_tensors="np",
            max_length=L,
            padding="max_length",
            truncation=True,
        )
        return enc["input_ids"].astype(np.int32)


class SigLipTokenizer:
    """SigLIP sentencepiece tokenizer wrapper (ref: tokenizer.py:557-620).

    Distinct from :class:`HFTokenizer` in its canonicalization contract —
    SigLIP training canonicalizes captions (HTML-unescape, punctuation
    strip, whitespace collapse, NO lowercasing for case-sensitive vocabs)
    before sentencepiece encoding — and in its pad/eos conventions
    (pad=0 for gemma vocabs, pad=1/eos=1 for T5 vocabs).

    ``tokenizer_name`` may be a local sentencepiece model path, a local HF
    tokenizer directory, or a hub name (hub resolution requires network —
    offline use must pass a local path; the reference's VOCAB_FILES URL
    table is download-only scaffolding we do not replicate).
    """

    def __init__(self, tokenizer_name: str, context_length: Optional[int] = 64):
        self.context_length = context_length
        self._gemma = "gemma" in tokenizer_name
        from transformers import GemmaTokenizerFast, T5TokenizerFast

        cls = GemmaTokenizerFast if self._gemma else T5TokenizerFast
        kwargs = (
            dict(padding_side="right", add_bos_token=False, add_eos_token=True)
            if self._gemma
            else dict(extra_ids=0, legacy=False)
        )
        p = Path(tokenizer_name)
        if p.exists() and p.is_file():
            # bare sentencepiece .model file
            self.tokenizer = cls(vocab_file=str(p), **kwargs)
        else:
            self.tokenizer = cls.from_pretrained(tokenizer_name, **kwargs)
        self.tokenizer.pad_token_id = 0 if self._gemma else 1
        self.tokenizer.eos_token_id = 1
        self.vocab_size = self.tokenizer.vocab_size

    def save_pretrained(self, dest):
        self.tokenizer.save_pretrained(dest)

    @staticmethod
    def canonicalize(text: str) -> str:
        """SigLIP cleaning = big_vision prompt canonicalization (ref
        tokenizer.py:104-129 canonicalize_text, called at :615):
        HTML-unescape, underscore->space, punctuation strip, lowercase,
        whitespace collapse."""
        text = basic_clean(text).replace("_", " ")
        text = text.translate(str.maketrans("", "", string.punctuation))
        return whitespace_clean(text.lower())

    def __call__(
        self, texts: Union[str, Sequence[str]], context_length: Optional[int] = None
    ) -> np.ndarray:
        if isinstance(texts, str):
            texts = [texts]
        L = context_length or self.context_length
        texts = [self.canonicalize(t) for t in texts]
        enc = self.tokenizer(
            list(texts),
            return_tensors="np",
            max_length=L,
            padding="max_length",
            truncation=True,
        )
        return enc["input_ids"].astype(np.int32)
