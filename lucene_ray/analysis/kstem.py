"""KStem — Bob Krovetz' dictionary-backed English stemmer
(analysis/en/KStemmer.java, the Java port of the CIIR kstem; Krovetz,
"Viewing Morphology as an Inference Process", SIGIR'93).

Unlike the suffix-stripping Porter family, every rule here PROPOSES a
variant and a dictionary lookup DISPOSES: a transform is kept only when
the candidate root is a real word (or the ending is so productive it is
accepted outright). The word lists live in kstem_data.py (embedded DATA,
the stoplists/RSLP stance); this module mirrors the reference's rule
flow exactly — including its quirks (the `lookup()` the reference keeps
behind an `// ERROR` comment in alEndings, the un- prefix guard in
pastTense, j left at k when the array endsIn misses) — and is pinned
token-for-token by the reference's own 12,130-pair kstem_examples.txt
golden set (tests/test_kstem.py).

All state lives in a per-call object; ``kstem(term)`` is the pure entry
point (memoized — analyzer chains stem unique values only).
"""

from __future__ import annotations

from functools import lru_cache

from lucene_ray.analysis.kstem_data import (
    COUNTRY_NATIONALITY,
    DIRECT_CONFLATIONS,
    EXCEPTION_WORDS,
    HEAD_DICT,
    PROPER_NOUNS,
    SUPPLEMENT_DICT,
)

MAX_WORD_LEN = 50

# entry = (root | None, is_exception); root None means "word is its own stem"
_DEFAULT = (None, False)


def _build_dict() -> dict:
    d: dict[str, tuple] = {}
    for w in EXCEPTION_WORDS:
        d[w] = (w, True)
    for a, b in DIRECT_CONFLATIONS:
        d[a] = (b, False)
    for a, b in COUNTRY_NATIONALITY:
        d[a] = (b, False)
    for w in HEAD_DICT:
        d[w] = _DEFAULT
    for w in SUPPLEMENT_DICT:
        d[w] = _DEFAULT
    for w in PROPER_NOUNS:
        d[w] = _DEFAULT
    return d


_DICT = _build_dict()

_VOWELS = frozenset("aeiou")


class _KStem:
    """One stem() invocation's mutable state (word buffer, j, k,
    matched_entry) — the KStemmer.java field set."""

    __slots__ = ("word", "j", "k", "matched")

    def __init__(self, term: str):
        self.word = list(term)
        self.j = 0
        self.k = len(term) - 1
        self.matched = None  # the matchedEntry dict tuple, or None

    # ------------------------------------------------------------- helpers

    def _s(self) -> str:
        return "".join(self.word)

    def wlen(self) -> int:
        return len(self.word)

    def set_length(self, n: int) -> None:
        del self.word[n:]

    def write(self, ch: str) -> None:
        self.word.append(ch)

    def append(self, s: str) -> None:
        self.word.extend(s)

    def set_char(self, i: int, ch: str) -> None:
        self.word[i] = ch

    def is_cons(self, i: int) -> bool:
        ch = self.word[i]
        if ch in _VOWELS:
            return False
        if ch != "y" or i == 0:
            return True
        return not self.is_cons(i - 1)

    def is_vowel(self, i: int) -> bool:
        return not self.is_cons(i)

    def vowel_in_stem(self) -> bool:
        return any(self.is_vowel(i) for i in range(self.j + 1))

    def double_c(self, i: int) -> bool:
        if i < 1 or self.word[i] != self.word[i - 1]:
            return False
        return self.is_cons(i)

    def ends_in(self, s: str) -> bool:
        """The scalar endsIn overloads (len 2-4) set j only on a match;
        the char[] overload (len >= 5) sets j = k even on a miss —
        KStemmer.java:783-818. Mirror both."""
        n = len(s)
        if n > self.k:
            return False
        r = self.wlen() - n
        if n >= 5:
            self.j = self.k
        if self.word[r:] != list(s):
            return False
        self.j = r - 1
        return True

    def lookup(self) -> bool:
        self.matched = _DICT.get(self._s())
        return self.matched is not None

    def word_in_dict(self):
        if self.matched is not None:
            return self.matched
        e = _DICT.get(self._s())
        if e is not None and not e[1]:
            self.matched = e  # only cache non-exceptions
        return e

    # --------------------------------------------------------------- rules

    def plural(self) -> None:
        if self.word[self.k] != "s":
            return
        if self.ends_in("ies"):
            self.set_length(self.j + 3)
            self.k -= 1
            if self.lookup():  # calories -> calorie
                return
            self.k += 1
            self.write("s")
            # setSuffix("y")
            self.set_length(self.j + 1)
            self.append("y")
            self.k = self.j + 1
            self.lookup()
        elif self.ends_in("es"):
            # try just removing the "s"
            self.set_length(self.j + 2)
            self.k -= 1
            try_e = self.j > 0 and not (
                self.word[self.j] == "s" and self.word[self.j - 1] == "s"
            )
            if try_e and self.lookup():
                return
            # try removing the "es"
            self.set_length(self.j + 1)
            self.k -= 1
            if self.lookup():
                return
            # default: retain the "e"
            self.write("e")
            self.k += 1
            if not try_e:
                self.lookup()
            return
        else:
            if (
                self.wlen() > 3
                and self.word[self.k - 1] != "s"
                and not self.ends_in("ous")
            ):
                # unless the word ends in "ous" or double "s", drop the "s"
                self.set_length(self.k)
                self.k -= 1
                self.lookup()

    def past_tense(self) -> None:
        if self.wlen() <= 4:
            return
        if self.ends_in("ied"):
            self.set_length(self.j + 3)
            self.k -= 1
            if self.lookup():  # died -> die
                return
            self.k += 1
            self.write("d")
            self.set_length(self.j + 1)
            self.append("y")
            self.k = self.j + 1
            self.lookup()
            return
        if self.ends_in("ed") and self.vowel_in_stem():
            # root ends in 'e'?
            self.set_length(self.j + 2)
            self.k = self.j + 1
            entry = self.word_in_dict()
            if entry is not None and not entry[1]:
                return
            # try removing the "ed"
            self.set_length(self.j + 1)
            self.k = self.j
            if self.lookup():
                return
            if self.double_c(self.k):
                self.set_length(self.k)
                self.k -= 1
                if self.lookup():
                    return
                self.write(self.word[self.k])
                self.k += 1
                self.lookup()
                return
            # un- prefix: leave the word alone
            if self.word[0] == "u" and self.word[1] == "n":
                self.write("e")
                self.write("d")
                self.k += 2
                return
            # prefer to end with an 'e' (microcoded -> microcode)
            self.set_length(self.j + 1)
            self.write("e")
            self.k = self.j + 1
            return

    def aspect(self) -> None:
        if self.wlen() <= 5:
            return
        if self.ends_in("ing") and self.vowel_in_stem():
            # try adding an 'e' to the stem
            self.set_char(self.j + 1, "e")
            self.set_length(self.j + 2)
            self.k = self.j + 1
            entry = self.word_in_dict()
            if entry is not None and not entry[1]:
                return
            # remove the 'e' (and thus all of "ing")
            self.set_length(self.k)
            self.k -= 1
            if self.lookup():
                return
            if self.double_c(self.k):
                self.k -= 1
                self.set_length(self.k + 1)
                if self.lookup():
                    return
                self.write(self.word[self.k])  # restore doubled consonant
                self.k += 1
                self.lookup()
                return
            if self.j > 0 and self.is_cons(self.j) and self.is_cons(self.j - 1):
                self.k = self.j
                self.set_length(self.k + 1)
                return
            self.set_length(self.j + 1)
            self.write("e")
            self.k = self.j + 1
            return

    def ity_endings(self) -> None:
        old_k = self.k
        if self.ends_in("ity"):
            self.set_length(self.j + 1)  # remove -ity
            self.k = self.j
            if self.lookup():
                return
            self.write("e")  # -ity -> -e
            self.k = self.j + 1
            if self.lookup():
                return
            self.set_char(self.j + 1, "i")
            self.append("ty")
            self.k = old_k
            # -ability / -ibility -> -ble (productive, accept outright)
            if self.j > 0 and self.word[self.j - 1] == "i" and self.word[self.j] == "l":
                self.set_length(self.j - 1)
                self.append("le")
                self.k = self.j
                self.lookup()
                return
            # -ivity -> -ive
            if self.j > 0 and self.word[self.j - 1] == "i" and self.word[self.j] == "v":
                self.set_length(self.j + 1)
                self.write("e")
                self.k = self.j + 1
                self.lookup()
                return
            # -ality: just drop -ity
            if self.j > 0 and self.word[self.j - 1] == "a" and self.word[self.j] == "l":
                self.set_length(self.j + 1)
                self.k = self.j
                self.lookup()
                return
            if self.lookup():  # variant in dict (immunity -> immune path)
                return
            self.set_length(self.j + 1)  # default: remove -ity
            self.k = self.j
            return

    def nce_endings(self) -> None:
        old_k = self.k
        if self.ends_in("nce"):
            wc = self.word[self.j]
            if wc not in ("e", "a"):
                return
            self.set_length(self.j)
            self.write("e")  # adherance -> adhere
            self.k = self.j
            if self.lookup():
                return
            self.set_length(self.j)  # disappearance -> disappear
            self.k = self.j - 1
            if self.lookup():
                return
            self.write(wc)
            self.append("nce")
            self.k = old_k

    def ness_endings(self) -> None:
        if self.ends_in("ness"):
            self.set_length(self.j + 1)
            self.k = self.j
            if self.word[self.j] == "i":
                self.set_char(self.j, "y")
            self.lookup()

    def ism_endings(self) -> None:
        if self.ends_in("ism"):
            self.set_length(self.j + 1)
            self.k = self.j
            self.lookup()

    def ment_endings(self) -> None:
        old_k = self.k
        if self.ends_in("ment"):
            self.set_length(self.j + 1)
            self.k = self.j
            if self.lookup():
                return
            self.append("ment")
            self.k = old_k

    def ize_endings(self) -> None:
        old_k = self.k
        if self.ends_in("ize"):
            self.set_length(self.j + 1)  # remove -ize entirely
            self.k = self.j
            if self.lookup():
                return
            self.write("i")
            if self.double_c(self.j):
                self.set_length(self.j)
                self.k = self.j - 1
                if self.lookup():
                    return
                self.write(self.word[self.j - 1])
            self.set_length(self.j + 1)
            self.write("e")  # -ize -> -e
            self.k = self.j + 1
            if self.lookup():
                return
            self.set_length(self.j + 1)
            self.append("ize")
            self.k = old_k

    def ncy_endings(self) -> None:
        if self.ends_in("ncy"):
            if self.word[self.j] not in ("e", "a"):
                return
            self.set_char(self.j + 2, "t")  # -ncy -> -nt
            self.set_length(self.j + 3)
            self.k = self.j + 2
            if self.lookup():
                return
            self.set_char(self.j + 2, "c")  # default: -nce
            self.write("e")
            self.k = self.j + 3
            self.lookup()

    def ble_endings(self) -> None:
        old_k = self.k
        if self.ends_in("ble"):
            if self.word[self.j] not in ("a", "i"):
                return
            wc = self.word[self.j]
            self.set_length(self.j)  # remove the ending
            self.k = self.j - 1
            if self.lookup():
                return
            if self.double_c(self.k):
                self.set_length(self.k)
                self.k -= 1
                if self.lookup():
                    return
                self.k += 1
                self.write(self.word[self.k - 1])
            self.set_length(self.j)
            self.write("e")  # -a/ible -> -e
            self.k = self.j
            if self.lookup():
                return
            self.set_length(self.j)
            self.append("ate")  # compensable -> compensate
            self.k = self.j + 2
            if self.lookup():
                return
            self.set_length(self.j)
            self.write(wc)
            self.append("ble")
            self.k = old_k

    def ic_endings(self) -> None:
        if self.ends_in("ic"):
            self.set_length(self.j + 3)
            self.append("al")  # -ic -> -ical (canonic -> canonical)
            self.k = self.j + 4
            if self.lookup():
                return
            self.set_char(self.j + 1, "y")  # -ic -> -y
            self.set_length(self.j + 2)
            self.k = self.j + 1
            if self.lookup():
                return
            self.set_char(self.j + 1, "e")  # -ic -> -e
            if self.lookup():
                return
            self.set_length(self.j + 1)  # remove -ic
            self.k = self.j
            if self.lookup():
                return
            self.append("ic")
            self.k = self.j + 2

    def ion_endings(self) -> None:
        old_k = self.k
        if not self.ends_in("ion"):
            return
        if self.ends_in("ization"):
            # -ize is productive: accept it as the root
            self.set_length(self.j + 3)
            self.write("e")
            self.k = self.j + 3
            self.lookup()
            return
        if self.ends_in("ition"):
            self.set_length(self.j + 1)
            self.write("e")
            self.k = self.j + 1
            if self.lookup():  # definition -> define
                return
            self.set_length(self.j + 1)
            self.append("ition")
            self.k = old_k
        elif self.ends_in("ation"):
            self.set_length(self.j + 3)
            self.write("e")
            self.k = self.j + 3
            if self.lookup():  # elimination -> eliminate
                return
            self.set_length(self.j + 1)
            self.write("e")  # remove -ation, add -e
            self.k = self.j + 1
            if self.lookup():
                return
            self.set_length(self.j + 1)  # just remove -ation
            self.k = self.j
            if self.lookup():
                return
            self.set_length(self.j + 1)
            self.append("ation")
            self.k = old_k
        if self.ends_in("ication"):
            self.set_length(self.j + 1)
            self.write("y")
            self.k = self.j + 1
            if self.lookup():  # amplification -> amplify
                return
            self.set_length(self.j + 1)
            self.append("ication")
            self.k = old_k
        # plain -ion (j re-derived as in the reference's YCS fixup)
        self.j = self.k - 3
        self.set_length(self.j + 1)
        self.write("e")
        self.k = self.j + 1
        if self.lookup():  # -ion -> -e
            return
        self.set_length(self.j + 1)
        self.k = self.j
        if self.lookup():  # remove -ion
            return
        self.set_length(self.j + 1)
        self.append("ion")
        self.k = old_k

    def er_and_or_endings(self) -> None:
        old_k = self.k
        if self.word[self.k] != "r":
            return
        if self.ends_in("izer"):
            self.set_length(self.j + 4)
            self.k = self.j + 3
            self.lookup()
            return
        if self.ends_in("er") or self.ends_in("or"):
            wc = self.word[self.j + 1]
            if self.double_c(self.j):
                self.set_length(self.j)
                self.k = self.j - 1
                if self.lookup():
                    return
                self.write(self.word[self.j - 1])
            if self.word[self.j] == "i":  # -ier
                self.set_char(self.j, "y")
                self.set_length(self.j + 1)
                self.k = self.j
                if self.lookup():
                    return
                self.set_char(self.j, "i")
                self.write("e")
            if self.word[self.j] == "e":  # -eer
                self.set_length(self.j)
                self.k = self.j - 1
                if self.lookup():
                    return
                self.write("e")
            self.set_length(self.j + 2)  # remove the -r
            self.k = self.j + 1
            if self.lookup():
                return
            self.set_length(self.j + 1)  # remove -er/-or
            self.k = self.j
            if self.lookup():
                return
            self.write("e")  # -or -> -e
            self.k = self.j + 1
            if self.lookup():
                return
            self.set_length(self.j + 1)
            self.write(wc)
            self.write("r")
            self.k = old_k

    def ly_endings(self) -> None:
        old_k = self.k
        if self.ends_in("ly"):
            self.set_char(self.j + 2, "e")  # -ly -> -le
            if self.lookup():
                return
            self.set_char(self.j + 2, "y")
            self.set_length(self.j + 1)  # remove the -ly
            self.k = self.j
            if self.lookup():
                return
            if self.j > 0 and self.word[self.j - 1] == "a" and self.word[self.j] == "l":
                return  # -ally -> -al, always
            self.append("ly")
            self.k = old_k
            if self.j > 0 and self.word[self.j - 1] == "a" and self.word[self.j] == "b":
                self.set_char(self.j + 2, "e")  # -ably -> -able, always
                self.k = self.j + 2
                return
            if self.word[self.j] == "i":  # militarily -> military
                self.set_length(self.j)
                self.write("y")
                self.k = self.j
                if self.lookup():
                    return
                self.set_length(self.j)
                self.append("ily")
                self.k = old_k
            self.set_length(self.j + 1)  # default: remove -ly
            self.k = self.j

    def al_endings(self) -> None:
        old_k = self.k
        if self.wlen() < 4:
            return
        if self.ends_in("al"):
            self.set_length(self.j + 1)
            self.k = self.j
            if self.lookup():  # remove the -al
                return
            if self.double_c(self.j):
                self.set_length(self.j)
                self.k = self.j - 1
                if self.lookup():
                    return
                self.write(self.word[self.j - 1])
            self.set_length(self.j + 1)
            self.write("e")  # -al -> -e
            self.k = self.j + 1
            if self.lookup():
                return
            self.set_length(self.j + 1)
            self.append("um")  # optimal -> optimum
            self.k = self.j + 2
            if self.lookup():
                return
            self.set_length(self.j + 1)
            self.append("al")
            self.k = old_k
            if self.j > 0 and self.word[self.j - 1] == "i" and self.word[self.j] == "c":
                self.set_length(self.j - 1)  # remove -ical
                self.k = self.j - 2
                if self.lookup():
                    return
                self.set_length(self.j - 1)
                self.write("y")  # -ical -> -y
                self.k = self.j - 1
                if self.lookup():
                    return
                self.set_length(self.j - 1)
                self.append("ic")  # default: -ical -> -ic
                self.k = self.j
                # the reference keeps this lookup behind an "// ERROR"
                # comment (KStemmer.java:1652) — mirror the behavior
                self.lookup()
                return
            if self.word[self.j] == "i":  # -ial sometimes removed
                self.set_length(self.j)
                self.k = self.j - 1
                if self.lookup():
                    return
                self.append("ial")
                self.k = old_k
                self.lookup()

    def ive_endings(self) -> None:
        old_k = self.k
        if self.ends_in("ive"):
            self.set_length(self.j + 1)  # remove -ive
            self.k = self.j
            if self.lookup():
                return
            self.write("e")  # -ive -> -e
            self.k = self.j + 1
            if self.lookup():
                return
            self.set_length(self.j + 1)
            self.append("ive")
            if self.j > 0 and self.word[self.j - 1] == "a" and self.word[self.j] == "t":
                self.set_char(self.j - 1, "e")  # determinative -> determine
                self.set_length(self.j)
                self.k = self.j - 1
                if self.lookup():
                    return
                self.set_length(self.j - 1)  # just remove -ative
                if self.lookup():
                    return
                self.append("ative")
                self.k = old_k
            # -ive -> -ion (injunctive -> injunction)
            self.set_char(self.j + 2, "o")
            self.set_char(self.j + 3, "n")
            if self.lookup():
                return
            self.set_char(self.j + 2, "v")
            self.set_char(self.j + 3, "e")
            self.k = old_k

    # ---------------------------------------------------------------- main

    def run(self) -> str | None:
        """The KStemmer.stem main sequence; returns the stem, or None if
        the term must pass through unchanged."""
        if self.k <= 1 or self.k >= MAX_WORD_LEN - 1:
            return None
        term = self._s()
        entry = _DICT.get(term)
        if entry is not None:
            return entry[0] if entry[0] is not None else None
        for ch in term:
            if not ("a" <= ch <= "z"):
                return None
        self.matched = None
        steps = (
            self.plural, self.past_tense, self.aspect, self.ity_endings,
            self.ness_endings, self.ion_endings, self.er_and_or_endings,
            self.ly_endings, self.al_endings,
        )
        done = False
        for step in steps:
            step()
            if self.matched is not None:
                done = True
                break
        if not done:
            self.word_in_dict()
            for step in (
                self.ive_endings, self.ize_endings, self.ment_endings,
                self.ble_endings, self.ism_endings, self.ic_endings,
                self.ncy_endings, self.nce_endings,
            ):
                step()
                if self.matched is not None:
                    break
        # direct mapping (italians -> italy)
        if self.matched is not None and self.matched[0] is not None:
            return self.matched[0]
        return self._s()


def kstem_stem_terms(terms):
    """Stem a token array, one python stem per UNIQUE term (dictionary
    encode -> stem vocab -> gather — the KStemFilter over Arrow)."""
    import numpy as np
    import pyarrow as pa

    d = (
        terms.dictionary_encode()
        if not isinstance(terms, pa.DictionaryArray)
        else terms
    )
    vocab = d.dictionary.to_pylist()
    stemmed = [kstem(t) for t in vocab]
    idx = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    out = np.array(stemmed, dtype=object)[idx]
    return pa.array(out.tolist(), type=pa.string())


@lru_cache(maxsize=65536)
def kstem(term: str) -> str:
    """Stem one (already-lowercased) term — KStemFilter semantics: terms
    with non a-z chars, length <= 2 or >= 50 pass through unchanged."""
    out = _KStem(term).run()
    return term if out is None else out
