"""Greek analysis — GreekLowerCaseFilter fold + the 22-rule GreekStemmer,
re-expressed in Python from the reference sources as spec:

  el/GreekLowerCaseFilter.java:45-110  greek_fold (final sigma + the
                                       tonos/dialytika diacritic strips,
                                       applied after standard lowercase)
  el/GreekStemmer.java:30-955          greek_stem (Ntais/Saroukos rules:
                                       22 ordered rules over a char
                                       buffer + live length; "add back"
                                       rules restore truncated chars, a
                                       few rewrite the buffer in place)

The Java sources have two operator-precedence quirks (&& binds tighter
than ||, so a few length guards apply only to the FIRST suffix of an
or-chain — rule0's σκαγιου group and rule8's three else-if arms); they
are mirrored verbatim here because the published test vectors pin them.
Golden tests parse the reference's own TestGreekStemmer checkOneTerm
vectors at test time (tests/test_lang2.py). Per-UNIQUE-term via
lightstem.light_stem_terms.
"""

from __future__ import annotations

__all__ = ["greek_fold", "greek_stem"]

# post-lowercase folds: final sigma + diacritic strips (the capital
# branches of the Java switch reach these via str.lower first)
_EL_FOLD = str.maketrans(
    {
        "ς": "σ",
        "ά": "α",
        "έ": "ε",
        "ή": "η",
        "ί": "ι",
        "ϊ": "ι",
        "ΐ": "ι",
        "ύ": "υ",
        "ϋ": "υ",
        "ΰ": "υ",
        "ό": "ο",
        "ώ": "ω",
    }
)


def greek_fold(token: str) -> str:
    return token.lower().translate(_EL_FOLD)


def _ew(s: list, n: int, suffix: str) -> bool:
    k = len(suffix)
    return k <= n and "".join(s[n - k : n]) == suffix


def _pre(s: list, n: int) -> str:
    return "".join(s[:n])


_VOWELS = frozenset("αεηιουω")
_VOWELS_NO_Y = frozenset("αεηιοω")


def _ev(s, n):
    return n > 0 and s[n - 1] in _VOWELS


def _ev_no_y(s, n):
    return n > 0 and s[n - 1] in _VOWELS_NO_Y


def _rule0(s, n):
    if n > 9 and (_ew(s, n, "καθεστωτοσ") or _ew(s, n, "καθεστωτων")):
        return n - 4
    if n > 8 and (_ew(s, n, "γεγονοτοσ") or _ew(s, n, "γεγονοτων")):
        return n - 4
    if n > 8 and _ew(s, n, "καθεστωτα"):
        return n - 3
    if n > 7 and (_ew(s, n, "τατογιου") or _ew(s, n, "τατογιων")):
        return n - 4
    if n > 7 and _ew(s, n, "γεγονοτα"):
        return n - 3
    if n > 7 and _ew(s, n, "καθεστωσ"):
        return n - 2
    # Java precedence quirk: the n>6 guard binds only to σκαγιου
    if (
        (n > 6 and _ew(s, n, "σκαγιου"))
        or _ew(s, n, "σκαγιων")
        or _ew(s, n, "ολογιου")
        or _ew(s, n, "ολογιων")
        or _ew(s, n, "κρεατοσ")
        or _ew(s, n, "κρεατων")
        or _ew(s, n, "περατοσ")
        or _ew(s, n, "περατων")
        or _ew(s, n, "τερατοσ")
        or _ew(s, n, "τερατων")
    ):
        return n - 4
    if n > 6 and _ew(s, n, "τατογια"):
        return n - 3
    if n > 6 and _ew(s, n, "γεγονοσ"):
        return n - 2
    if n > 5 and (
        _ew(s, n, "φαγιου")
        or _ew(s, n, "φαγιων")
        or _ew(s, n, "σογιου")
        or _ew(s, n, "σογιων")
    ):
        return n - 4
    if n > 5 and (
        _ew(s, n, "σκαγια")
        or _ew(s, n, "ολογια")
        or _ew(s, n, "κρεατα")
        or _ew(s, n, "περατα")
        or _ew(s, n, "τερατα")
    ):
        return n - 3
    if n > 4 and (
        _ew(s, n, "φαγια")
        or _ew(s, n, "σογια")
        or _ew(s, n, "φωτοσ")
        or _ew(s, n, "φωτων")
    ):
        return n - 3
    if n > 4 and (_ew(s, n, "κρεασ") or _ew(s, n, "περασ") or _ew(s, n, "τερασ")):
        return n - 2
    if n > 3 and _ew(s, n, "φωτα"):
        return n - 2
    if n > 2 and _ew(s, n, "φωσ"):
        return n - 1
    return n


def _rule1(s, n):
    if n > 4 and (_ew(s, n, "αδεσ") or _ew(s, n, "αδων")):
        n -= 4
        if not (
            _ew(s, n, "οκ")
            or _ew(s, n, "μαμ")
            or _ew(s, n, "μαν")
            or _ew(s, n, "μπαμπ")
            or _ew(s, n, "πατερ")
            or _ew(s, n, "γιαγι")
            or _ew(s, n, "νταντ")
            or _ew(s, n, "κυρ")
            or _ew(s, n, "θει")
            or _ew(s, n, "πεθερ")
        ):
            n += 2  # add back -αδ
    return n


def _rule2(s, n):
    if n > 4 and (_ew(s, n, "εδεσ") or _ew(s, n, "εδων")):
        n -= 4
        if (
            _ew(s, n, "οπ")
            or _ew(s, n, "ιπ")
            or _ew(s, n, "εμπ")
            or _ew(s, n, "υπ")
            or _ew(s, n, "γηπ")
            or _ew(s, n, "δαπ")
            or _ew(s, n, "κρασπ")
            or _ew(s, n, "μιλ")
        ):
            n += 2  # add back -εδ
    return n


def _rule3(s, n):
    if n > 5 and (_ew(s, n, "ουδεσ") or _ew(s, n, "ουδων")):
        n -= 5
        if (
            _ew(s, n, "αρκ")
            or _ew(s, n, "καλιακ")
            or _ew(s, n, "πεταλ")
            or _ew(s, n, "λιχ")
            or _ew(s, n, "πλεξ")
            or _ew(s, n, "σκ")
            or _ew(s, n, "σ")
            or _ew(s, n, "φλ")
            or _ew(s, n, "φρ")
            or _ew(s, n, "βελ")
            or _ew(s, n, "λουλ")
            or _ew(s, n, "χν")
            or _ew(s, n, "σπ")
            or _ew(s, n, "τραγ")
            or _ew(s, n, "φε")
        ):
            n += 3  # add back -ουδ
    return n


_EXC4 = frozenset(["θ", "δ", "ελ", "γαλ", "ν", "π", "ιδ", "παρ"])


def _rule4(s, n):
    if n > 3 and (_ew(s, n, "εωσ") or _ew(s, n, "εων")):
        n -= 3
        if _pre(s, n) in _EXC4:
            n += 1  # add back -ε
    return n


def _rule5(s, n):
    if n > 2 and _ew(s, n, "ια"):
        n -= 2
        if _ev(s, n):
            n += 1  # add back -ι
    elif n > 3 and (_ew(s, n, "ιου") or _ew(s, n, "ιων")):
        n -= 3
        if _ev(s, n):
            n += 1  # add back -ι
    return n


_EXC6 = frozenset(
    [
        "αλ", "αδ", "ενδ", "αμαν", "αμμοχαλ", "ηθ", "ανηθ", "αντιδ", "φυσ",
        "βρωμ", "γερ", "εξωδ", "καλπ", "καλλιν", "καταδ", "μουλ", "μπαν",
        "μπαγιατ", "μπολ", "μποσ", "νιτ", "ξικ", "συνομηλ", "πετσ", "πιτσ",
        "πικαντ", "πλιατσ", "ποστελν", "πρωτοδ", "σερτ", "συναδ", "τσαμ",
        "υποδ", "φιλον", "φυλοδ", "χασ",
    ]
)


def _rule6(s, n):
    removed = False
    if n > 3 and (_ew(s, n, "ικα") or _ew(s, n, "ικο")):
        n -= 3
        removed = True
    elif n > 4 and (_ew(s, n, "ικου") or _ew(s, n, "ικων")):
        n -= 4
        removed = True
    if removed and (_ev(s, n) or _pre(s, n) in _EXC6):
        n += 2  # add back -ικ
    return n


_EXC7 = frozenset(
    ["αναπ", "αποθ", "αποκ", "αποστ", "βουβ", "ξεθ", "ουλ", "πεθ", "πικρ",
     "ποτ", "σιχ", "χ"]
)


def _rule7(s, n):
    if n == 5 and _ew(s, n, "αγαμε"):
        return n - 1
    if n > 7 and _ew(s, n, "ηθηκαμε"):
        n -= 7
    elif n > 6 and _ew(s, n, "ουσαμε"):
        n -= 6
    elif n > 5 and (_ew(s, n, "αγαμε") or _ew(s, n, "ησαμε") or _ew(s, n, "ηκαμε")):
        n -= 5
    if n > 3 and _ew(s, n, "αμε"):
        n -= 3
        if _pre(s, n) in _EXC7:
            n += 2  # add back -αμ
    return n


_EXC8A = frozenset(["τρ", "τσ"])
_EXC8B = frozenset(
    [
        "βετερ", "βουλκ", "βραχμ", "γ", "δραδουμ", "θ", "καλπουζ", "καστελ",
        "κορμορ", "λαοπλ", "μωαμεθ", "μ", "μουσουλμ", "ν", "ουλ", "π",
        "πελεκ", "πλ", "πολισ", "πορτολ", "σαρακατσ", "σουλτ", "τσαρλατ",
        "ορφ", "τσιγγ", "τσοπ", "φωτοστεφ", "χ", "ψυχοπλ", "αγ", "γαλ",
        "γερ", "δεκ", "διπλ", "αμερικαν", "ουρ", "πιθ", "πουριτ", "σ",
        "ζωντ", "ικ", "καστ", "κοπ", "λιχ", "λουθηρ", "μαιντ", "μελ", "σιγ",
        "σπ", "στεγ", "τραγ", "τσαγ", "φ", "ερ", "αδαπ", "αθιγγ", "αμηχ",
        "ανικ", "ανοργ", "απηγ", "απιθ", "ατσιγγ", "βασ", "βασκ", "βαθυγαλ",
        "βιομηχ", "βραχυκ", "διατ", "διαφ", "ενοργ", "θυσ", "καπνοβιομηχ",
        "καταγαλ", "κλιβ", "κοιλαρφ", "λιβ", "μεγλοβιομηχ", "μικροβιομηχ",
        "νταβ", "ξηροκλιβ", "ολιγοδαμ", "ολογαλ", "πενταρφ", "περηφ",
        "περιτρ", "πλατ", "πολυδαπ", "πολυμηχ", "στεφ", "ταβ", "τετ",
        "υπερηφ", "υποκοπ", "χαμηλοδαπ", "ψηλοταβ",
    ]
)


def _rule8(s, n):
    removed = False
    if n > 8 and _ew(s, n, "ιουντανε"):
        n -= 8
        removed = True
    # Java precedence quirk in the three arms below: the length guard
    # binds only to the FIRST suffix of each or-chain
    elif (n > 7 and _ew(s, n, "ιοντανε")) or _ew(s, n, "ουντανε") or _ew(
        s, n, "ηθηκανε"
    ):
        n -= 7
        removed = True
    elif (n > 6 and _ew(s, n, "ιοτανε")) or _ew(s, n, "οντανε") or _ew(
        s, n, "ουσανε"
    ):
        n -= 6
        removed = True
    elif (n > 5 and _ew(s, n, "αγανε")) or _ew(s, n, "ησανε") or _ew(
        s, n, "οτανε"
    ) or _ew(s, n, "ηκανε"):
        n -= 5
        removed = True
    if removed and _pre(s, n) in _EXC8A:
        n += 4
        s[n - 4], s[n - 3], s[n - 2], s[n - 1] = "α", "γ", "α", "ν"
    if n > 3 and _ew(s, n, "ανε"):
        n -= 3
        if _ev_no_y(s, n) or _pre(s, n) in _EXC8B:
            n += 2  # add back -αν
    return n


_EXC9 = frozenset(
    ["αβαρ", "βεν", "εναρ", "αβρ", "αδ", "αθ", "αν", "απλ", "βαρον", "ντρ",
     "σκ", "κοπ", "μπορ", "νιφ", "παγ", "παρακαλ", "σερπ", "σκελ", "συρφ",
     "τοκ", "υ", "δ", "εμ", "θαρρ", "θ"]
)
_R9_SUFFIX = (
    "οδ", "αιρ", "φορ", "ταθ", "διαθ", "σχ", "ενδ", "ευρ", "τιθ", "υπερθ",
    "ραθ", "ενθ", "ροθ", "σθ", "πυρ", "αιν", "συνδ", "συν", "συνθ", "χωρ",
    "πον", "βρ", "καθ", "ευθ", "εκθ", "νετ", "ρον", "αρκ", "βαρ", "βολ",
    "ωφελ",
)


def _rule9(s, n):
    if n > 5 and _ew(s, n, "ησετε"):
        n -= 5
    if n > 3 and _ew(s, n, "ετε"):
        n -= 3
        if (
            _pre(s, n) in _EXC9
            or _ev_no_y(s, n)
            or any(_ew(s, n, x) for x in _R9_SUFFIX)
        ):
            n += 2  # add back -ετ
    return n


def _rule10(s, n):
    if n > 5 and (_ew(s, n, "οντασ") or _ew(s, n, "ωντασ")):
        n -= 5
        if n == 3 and _ew(s, n, "αρχ"):
            n += 3  # add back *ντ
            s[n - 3] = "ο"
        if _ew(s, n, "κρε"):
            n += 3  # add back *ντ
            s[n - 3] = "ω"
    return n


def _rule11(s, n):
    if n > 6 and _ew(s, n, "ομαστε"):
        n -= 6
        if n == 2 and _ew(s, n, "ον"):
            n += 5  # add back -ομαστ
    elif n > 7 and _ew(s, n, "ιομαστε"):
        n -= 7
        if n == 2 and _ew(s, n, "ον"):
            n += 5
            s[n - 5], s[n - 4], s[n - 3], s[n - 2], s[n - 1] = (
                "ο", "μ", "α", "σ", "τ",
            )
    return n


_EXC12A = frozenset(["π", "απ", "συμπ", "ασυμπ", "ακαταπ", "αμεταμφ"])
_EXC12B = frozenset(
    ["αλ", "αρ", "εκτελ", "ζ", "μ", "ξ", "παρακαλ", "προ", "νισ"]
)


def _rule12(s, n):
    if n > 5 and _ew(s, n, "ιεστε"):
        n -= 5
        if _pre(s, n) in _EXC12A:
            n += 4  # add back -ιεστ
    if n > 4 and _ew(s, n, "εστε"):
        n -= 4
        if _pre(s, n) in _EXC12B:
            n += 3  # add back -εστ
    return n


_EXC13 = frozenset(["διαθ", "θ", "παρακαταθ", "προσθ", "συνθ"])


def _rule13(s, n):
    if n > 6 and _ew(s, n, "ηθηκεσ"):
        n -= 6
    elif n > 5 and (_ew(s, n, "ηθηκα") or _ew(s, n, "ηθηκε")):
        n -= 5
    removed = False
    if n > 4 and _ew(s, n, "ηκεσ"):
        n -= 4
        removed = True
    elif n > 3 and (_ew(s, n, "ηκα") or _ew(s, n, "ηκε")):
        n -= 3
        removed = True
    if removed and (
        _pre(s, n) in _EXC13
        or _ew(s, n, "σκωλ")
        or _ew(s, n, "σκουλ")
        or _ew(s, n, "ναρθ")
        or _ew(s, n, "σφ")
        or _ew(s, n, "οθ")
        or _ew(s, n, "πιθ")
    ):
        n += 2  # add back -ηκ
    return n


_EXC14 = frozenset(
    ["φαρμακ", "χαδ", "αγκ", "αναρρ", "βρομ", "εκλιπ", "λαμπιδ", "λεχ", "μ",
     "πατ", "ρ", "λ", "μεδ", "μεσαζ", "υποτειν", "αμ", "αιθ", "ανηκ",
     "δεσποζ", "ενδιαφερ", "δε", "δευτερευ", "καθαρευ", "πλε", "τσα"]
)


def _rule14(s, n):
    removed = False
    if n > 5 and _ew(s, n, "ουσεσ"):
        n -= 5
        removed = True
    elif n > 4 and (_ew(s, n, "ουσα") or _ew(s, n, "ουσε")):
        n -= 4
        removed = True
    if removed and (
        _pre(s, n) in _EXC14
        or _ev(s, n)
        or _ew(s, n, "ποδαρ")
        or _ew(s, n, "βλεπ")
        or _ew(s, n, "πανταχ")
        or _ew(s, n, "φρυδ")
        or _ew(s, n, "μαντιλ")
        or _ew(s, n, "μαλλ")
        or _ew(s, n, "κυματ")
        or _ew(s, n, "λαχ")
        or _ew(s, n, "ληγ")
        or _ew(s, n, "φαγ")
        or _ew(s, n, "ομ")
        or _ew(s, n, "πρωτ")
    ):
        n += 3  # add back -ουσ
    return n


_EXC15A = frozenset(
    ["αβαστ", "πολυφ", "αδηφ", "παμφ", "ρ", "ασπ", "αφ", "αμαλ", "αμαλλι",
     "ανυστ", "απερ", "ασπαρ", "αχαρ", "δερβεν", "δροσοπ", "ξεφ", "νεοπ",
     "νομοτ", "ολοπ", "ομοτ", "προστ", "προσωποπ", "συμπ", "συντ", "τ",
     "υποτ", "χαρ", "αειπ", "αιμοστ", "ανυπ", "αποτ", "αρτιπ", "διατ", "εν",
     "επιτ", "κροκαλοπ", "σιδηροπ", "λ", "ναυ", "ουλαμ", "ουρ", "π", "τρ",
     "μ"]
)
_EXC15B = frozenset(["ψοφ", "ναυλοχ"])


def _rule15(s, n):
    removed = False
    if n > 4 and _ew(s, n, "αγεσ"):
        n -= 4
        removed = True
    elif n > 3 and (_ew(s, n, "αγα") or _ew(s, n, "αγε")):
        n -= 3
        removed = True
    if removed:
        cond1 = (
            _pre(s, n) in _EXC15A
            or _ew(s, n, "οφ")
            or _ew(s, n, "πελ")
            or _ew(s, n, "χορτ")
            or _ew(s, n, "λλ")
            or _ew(s, n, "σφ")
            or _ew(s, n, "ρπ")
            or _ew(s, n, "φρ")
            or _ew(s, n, "πρ")
            or _ew(s, n, "λοχ")
            or _ew(s, n, "σμην")
        )
        cond2 = _pre(s, n) in _EXC15B or _ew(s, n, "κολλ")
        if cond1 and not cond2:
            n += 2  # add back -αγ
    return n


_EXC16 = frozenset(["ν", "χερσον", "δωδεκαν", "ερημον", "μεγαλον", "επταν"])


def _rule16(s, n):
    removed = False
    if n > 4 and _ew(s, n, "ησου"):
        n -= 4
        removed = True
    elif n > 3 and (_ew(s, n, "ησε") or _ew(s, n, "ησα")):
        n -= 3
        removed = True
    if removed and _pre(s, n) in _EXC16:
        n += 2  # add back -ησ
    return n


_EXC17 = frozenset(
    ["ασβ", "σβ", "αχρ", "χρ", "απλ", "αειμν", "δυσχρ", "ευχρ", "κοινοχρ",
     "παλιμψ"]
)


def _rule17(s, n):
    if n > 4 and _ew(s, n, "ηστε"):
        n -= 4
        if _pre(s, n) in _EXC17:
            n += 3  # add back -ηστ
    return n


_EXC18 = frozenset(["ν", "ρ", "σπι", "στραβομουτσ", "κακομουτσ", "εξων"])


def _rule18(s, n):
    removed = False
    if n > 6 and (_ew(s, n, "ησουνε") or _ew(s, n, "ηθουνε")):
        n -= 6
        removed = True
    elif n > 4 and _ew(s, n, "ουνε"):
        n -= 4
        removed = True
    if removed and _pre(s, n) in _EXC18:
        n += 3
        s[n - 3], s[n - 2], s[n - 1] = "ο", "υ", "ν"
    return n


_EXC19 = frozenset(
    ["παρασουσ", "φ", "χ", "ωριοπλ", "αζ", "αλλοσουσ", "ασουσ"]
)


def _rule19(s, n):
    removed = False
    if n > 6 and (_ew(s, n, "ησουμε") or _ew(s, n, "ηθουμε")):
        n -= 6
        removed = True
    elif n > 4 and _ew(s, n, "ουμε"):
        n -= 4
        removed = True
    if removed and _pre(s, n) in _EXC19:
        n += 3
        s[n - 3], s[n - 2], s[n - 1] = "ο", "υ", "μ"
    return n


def _rule20(s, n):
    if n > 5 and (_ew(s, n, "ματων") or _ew(s, n, "ματοσ")):
        n -= 3
    elif n > 4 and _ew(s, n, "ματα"):
        n -= 2
    return n


_R21_GROUPS = (
    (9, 9, ("ιοντουσαν",)),
    (8, 8, ("ιομασταν", "ιοσασταν", "ιουμαστε", "οντουσαν")),
    (7, 7, ("ιεμαστε", "ιεσαστε", "ιομουνα", "ιοσαστε", "ιοσουνα",
            "ιουνται", "ιουνταν", "ηθηκατε", "ομασταν", "οσασταν",
            "ουμαστε")),
    (6, 6, ("ιομουν", "ιονταν", "ιοσουν", "ηθειτε", "ηθηκαν", "ομουνα",
            "οσαστε", "οσουνα", "ουνται", "ουνταν", "ουσατε")),
    (5, 5, ("αγατε", "ιεμαι", "ιεται", "ιεσαι", "ιοταν", "ιουμα", "ηθεισ",
            "ηθουν", "ηκατε", "ησατε", "ησουν", "ομουν", "ονται", "ονταν",
            "οσουν", "ουμαι", "ουσαν")),
    (4, 4, ("αγαν", "αμαι", "ασαι", "αται", "ειτε", "εσαι", "εται", "ηδεσ",
            "ηδων", "ηθει", "ηκαν", "ησαν", "ησει", "ησεσ", "ομαι",
            "οταν")),
    (3, 3, ("αει", "εισ", "ηθω", "ησω", "ουν", "ουσ")),
    (2, 2, ("αν", "ασ", "αω", "ει", "εσ", "ησ", "οι", "οσ", "ου", "υσ",
            "ων")),
)


def _rule21(s, n):
    for guard, cut, sfxs in _R21_GROUPS:
        if n > guard and any(_ew(s, n, x) for x in sfxs):
            return n - cut
    if n > 1 and _ev(s, n):
        return n - 1
    return n


def _rule22(s, n):
    if _ew(s, n, "εστερ") or _ew(s, n, "εστατ"):
        return n - 5
    if (
        _ew(s, n, "οτερ")
        or _ew(s, n, "οτατ")
        or _ew(s, n, "υτερ")
        or _ew(s, n, "υτατ")
        or _ew(s, n, "ωτερ")
        or _ew(s, n, "ωτατ")
    ):
        return n - 4
    return n


_RULES = (
    _rule0, _rule1, _rule2, _rule3, _rule4, _rule5, _rule6, _rule7, _rule8,
    _rule9, _rule10, _rule11, _rule12, _rule13, _rule14, _rule15, _rule16,
    _rule17, _rule18, _rule19, _rule20,
)


def greek_stem(token: str) -> str:
    n = len(token)
    if n < 4:
        return token
    s = list(token)
    orig = n
    for rule in _RULES:
        n = rule(s, n)
    if n == orig:
        n = _rule21(s, n)
    n = _rule22(s, n)
    return "".join(s[:n])
