"""Porter (1980) stemmer — algorithm-exact reimplementation of the
reference's ``lucene/analysis/common/.../en/PorterStemmer.java``
(itself Martin Porter's canonical code: the updated ANSI-C/Java variant,
i.e. with the bli→ble / logi→log amendments, not the bare 1980 paper).

Step numbering below follows the paper (1a/1b/1c, 2, 3, 4, 5a, 5b); the
reference's Java file calls these step1..step6. Words of length <= 2 are
returned unchanged (the ``k <= k0+1`` early exit).
"""

from __future__ import annotations

_VOWELS = frozenset("aeiou")


def _is_cons(word: str, i: int) -> bool:
    c = word[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return True if i == 0 else not _is_cons(word, i - 1)
    return True


def _measure(stem: str) -> int:
    """m(): number of VC sequences in [C](VC){m}[V]."""
    m = 0
    i = 0
    n = len(stem)
    # skip initial consonants
    while i < n and _is_cons(stem, i):
        i += 1
    while i < n:
        # in a vowel run
        while i < n and not _is_cons(stem, i):
            i += 1
        if i >= n:
            break
        m += 1
        while i < n and _is_cons(stem, i):
            i += 1
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(word: str) -> bool:
    return (
        len(word) >= 2
        and word[-1] == word[-2]
        and _is_cons(word, len(word) - 1)
    )


def _cvc(word: str) -> bool:
    """True if word ends consonant-vowel-consonant, final cons not w/x/y."""
    if len(word) < 3:
        return False
    i = len(word) - 1
    if not _is_cons(word, i) or _is_cons(word, i - 1) or not _is_cons(word, i - 2):
        return False
    return word[i] not in "wxy"


def _replace_if_m(word: str, suffix: str, repl: str, min_m: int = 1) -> tuple[str, bool]:
    """If word ends with suffix and m(stem) >= min_m, replace; returns (word, matched)."""
    if word.endswith(suffix):
        stem = word[: len(word) - len(suffix)]
        if _measure(stem) >= min_m:
            return stem + repl, True
        return word, True  # suffix matched; rule consumed even if m too small
    return word, False


# (suffix, replacement) tables keyed by penultimate char, per the reference.
_STEP2 = {
    "a": (("ational", "ate"), ("tional", "tion")),
    "c": (("enci", "ence"), ("anci", "ance")),
    "e": (("izer", "ize"),),
    "l": (("bli", "ble"), ("alli", "al"), ("entli", "ent"), ("eli", "e"), ("ousli", "ous")),
    "o": (("ization", "ize"), ("ation", "ate"), ("ator", "ate")),
    "s": (("alism", "al"), ("iveness", "ive"), ("fulness", "ful"), ("ousness", "ous")),
    "t": (("aliti", "al"), ("iviti", "ive"), ("biliti", "ble")),
    "g": (("logi", "log"),),
}

_STEP3 = {
    "e": (("icate", "ic"), ("ative", ""), ("alize", "al")),
    "i": (("iciti", "ic"),),
    "l": (("ical", "ic"), ("ful", "")),
    "s": (("ness", ""),),
}

_STEP4_SUFFIXES = (
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant",
    "ement", "ment", "ent", "ion", "ou", "ism", "ate", "iti",
    "ous", "ive", "ize",
)


def porter_stem(word: str) -> str:
    """Stem one lowercase token. Input must already be lowercased."""
    if len(word) <= 2:
        return word

    # --- step 1a: plurals ---
    if word.endswith("s"):
        if word.endswith("sses"):
            word = word[:-2]
        elif word.endswith("ies"):
            word = word[:-3] + "i"
        elif not word.endswith("ss"):
            word = word[:-1]

    # --- step 1b: -ed / -ing ---
    if word.endswith("eed"):
        if _measure(word[:-3]) > 0:
            word = word[:-1]
    else:
        stripped = None
        if word.endswith("ed") and _has_vowel(word[:-2]):
            stripped = word[:-2]
        elif word.endswith("ing") and _has_vowel(word[:-3]):
            stripped = word[:-3]
        if stripped is not None:
            word = stripped
            if word.endswith(("at", "bl", "iz")):
                word += "e"
            elif _ends_double_cons(word) and word[-1] not in "lsz":
                word = word[:-1]
            elif _measure(word) == 1 and _cvc(word):
                word += "e"

    # --- step 1c: y → i ---
    if word.endswith("y") and _has_vowel(word[:-1]):
        word = word[:-1] + "i"

    # --- step 2 ---
    if len(word) >= 2:
        for suffix, repl in _STEP2.get(word[-2], ()):
            if word.endswith(suffix):
                word, _ = _replace_if_m(word, suffix, repl)
                break

    # --- step 3 ---
    if word:
        for suffix, repl in _STEP3.get(word[-1], ()):
            if word.endswith(suffix):
                word, _ = _replace_if_m(word, suffix, repl)
                break

    # --- step 4: drop suffix when m(stem) > 1 ---
    for suffix in _STEP4_SUFFIXES:
        if word.endswith(suffix):
            stem = word[: len(word) - len(suffix)]
            if suffix == "ion" and (not stem or stem[-1] not in "st"):
                continue  # (s|t)ion condition; other 'ion' endings fall through
            if _measure(stem) > 1:
                word = stem
            break

    # --- step 5a: final -e ---
    if word.endswith("e"):
        m = _measure(word[:-1])
        if m > 1 or (m == 1 and not _cvc(word[:-1])):
            word = word[:-1]

    # --- step 5b: -ll → -l when m > 1 ---
    if word.endswith("l") and _ends_double_cons(word) and _measure(word[:-1]) > 1:
        word = word[:-1]

    return word
