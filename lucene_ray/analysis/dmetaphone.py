"""Double Metaphone — Lawrence Philips' published 2000 algorithm
(C/C++ Users Journal; the encoder behind the reference's
analysis/phonetic/src/java/.../DoubleMetaphoneFilter.java, which wraps the
commons-codec realization of the same published spec).

``double_metaphone(value, max_code_len)`` returns ``(primary, alternate)``
— the alternate equals the primary unless a rule branches (Slavic /
Germanic / romance ambiguity). Implemented from the published rule set;
pinned by the reference module's own vectors
(TestDoubleMetaphoneFilter.java: international -> ANTR / ANTRNXNL,
Kuczewski -> KSSK + KXFS, hello -> HL, 12345 -> no code;
TestPhoneticFilter.java: aaa/bbb/ccc/easgasg -> A/PP/KK/ASKS) plus the
algorithm's canonical published examples (tests/test_phonetic.py).

Like the rest of the analysis chain this is pure Python over the UNIQUE
vocab only (encode_multi_terms dictionary-encodes first), so per-batch
cost is vocab-sized, not token-sized.
"""

from __future__ import annotations

from functools import lru_cache

_VOWELS = frozenset("AEIOUY")

_SILENT_START = ("GN", "KN", "PN", "WR", "PS")
_L_R_N_M_B_H_F_V_W_SPACE = ("L", "R", "N", "M", "B", "H", "F", "V", "W", " ")
_ES_EP_EB_EL_EY_IB_IL_IN_IE_EI_ER = (
    "ES", "EP", "EB", "EL", "EY", "IB", "IL", "IN", "IE", "EI", "ER",
)
_L_T_K_S_N_M_B_Z = ("L", "T", "K", "S", "N", "M", "B", "Z")


def _contains(value: str, start: int, length: int, *criteria: str) -> bool:
    if start < 0 or start + length > len(value):
        return False
    return value[start : start + length] in criteria


def _char_at(value: str, index: int) -> str:
    if index < 0 or index >= len(value):
        return "\0"
    return value[index]


def _is_vowel(c: str) -> bool:
    return c in _VOWELS


def _is_slavo_germanic(value: str) -> bool:
    return (
        "W" in value or "K" in value or "CZ" in value or "WITZ" in value
    )


class _Result:
    __slots__ = ("primary", "alternate", "max_len")

    def __init__(self, max_len: int):
        self.primary: list[str] = []
        self.alternate: list[str] = []
        self.max_len = max_len

    def append(self, p: str, a: str | None = None) -> None:
        self.append_primary(p)
        self.append_alternate(p if a is None else a)

    def append_primary(self, v: str) -> None:
        room = self.max_len - len(self.primary)
        if room > 0:
            self.primary.extend(v[:room])

    def append_alternate(self, v: str) -> None:
        room = self.max_len - len(self.alternate)
        if room > 0:
            self.alternate.extend(v[:room])

    def complete(self) -> bool:
        return (
            len(self.primary) >= self.max_len
            and len(self.alternate) >= self.max_len
        )


def _condition_c0(value: str, index: int) -> bool:
    """Germanic 'ACH' contexts where C hardens to K."""
    if _contains(value, index, 4, "CHIA"):
        return True
    if index <= 1:
        return False
    if _is_vowel(_char_at(value, index - 2)):
        return False
    if not _contains(value, index - 1, 3, "ACH"):
        return False
    c = _char_at(value, index + 2)
    return (c != "I" and c != "E") or _contains(
        value, index - 2, 6, "BACHER", "MACHER"
    )


def _condition_ch0(value: str, index: int) -> bool:
    """Greek roots at the start: chord, chymera, charisma..."""
    if index != 0:
        return False
    if not _contains(value, index + 1, 5, "HARAC", "HARIS") and not _contains(
        value, index + 1, 3, "HOR", "HYM", "HIA", "HEM"
    ):
        return False
    if _contains(value, 0, 5, "CHORE"):
        return False
    return True


def _condition_ch1(value: str, index: int) -> bool:
    """Germanic / spelling contexts where CH is K."""
    return (
        _contains(value, 0, 4, "VAN ", "VON ")
        or _contains(value, 0, 3, "SCH")
        or _contains(value, index - 2, 6, "ORCHES", "ARCHIT", "ORCHID")
        or _contains(value, index + 2, 1, "T", "S")
        or (
            (
                _contains(value, index - 1, 1, "A", "O", "U", "E")
                or index == 0
            )
            and (
                _contains(value, index + 2, 1, *_L_R_N_M_B_H_F_V_W_SPACE)
                or index + 1 == len(value) - 1
            )
        )
    )


def _condition_l0(value: str, index: int) -> bool:
    """Spanish-style LL (cabrillo, gallegos)."""
    if index == len(value) - 3 and _contains(
        value, index - 1, 4, "ILLO", "ILLA", "ALLE"
    ):
        return True
    if (
        _contains(value, len(value) - 2, 2, "AS", "OS")
        or _contains(value, len(value) - 1, 1, "A", "O")
    ) and _contains(value, index - 1, 4, "ALLE"):
        return True
    return False


def _condition_m0(value: str, index: int) -> bool:
    if _char_at(value, index + 1) == "M":
        return True
    return _contains(value, index - 1, 3, "UMB") and (
        index + 1 == len(value) - 1 or _contains(value, index + 2, 2, "ER")
    )


def _handle_c(value: str, r: _Result, index: int) -> int:
    if _condition_c0(value, index):
        r.append("K")
        index += 2
    elif index == 0 and _contains(value, index, 6, "CAESAR"):
        r.append("S")
        index += 2
    elif _contains(value, index, 2, "CH"):
        index = _handle_ch(value, r, index)
    elif _contains(value, index, 2, "CZ") and not _contains(
        value, index - 2, 4, "WICZ"
    ):
        r.append("S", "X")
        index += 2
    elif _contains(value, index + 1, 3, "CIA"):
        r.append("X")
        index += 3
    elif _contains(value, index, 2, "CC") and not (
        index == 1 and _char_at(value, 0) == "M"
    ):
        return _handle_cc(value, r, index)
    elif _contains(value, index, 2, "CK", "CG", "CQ"):
        r.append("K")
        index += 2
    elif _contains(value, index, 2, "CI", "CE", "CY"):
        if _contains(value, index, 3, "CIO", "CIE", "CIA"):
            r.append("S", "X")
        else:
            r.append("S")
        index += 2
    else:
        r.append("K")
        if _contains(value, index + 1, 2, " C", " Q", " G"):
            # mac caffrey / mac gregor
            index += 3
        elif _contains(value, index + 1, 1, "C", "K", "Q") and not _contains(
            value, index + 1, 2, "CE", "CI"
        ):
            index += 2
        else:
            index += 1
    return index


def _handle_cc(value: str, r: _Result, index: int) -> int:
    if _contains(value, index + 2, 1, "I", "E", "H") and not _contains(
        value, index + 2, 2, "HU"
    ):
        # bellocchio / bacchus-style double cc
        if (index == 1 and _char_at(value, index - 1) == "A") or _contains(
            value, index - 1, 5, "UCCEE", "UCCES"
        ):
            r.append("KS")
        else:
            r.append("X")
        index += 3
    else:
        r.append("K")
        index += 2
    return index


def _handle_ch(value: str, r: _Result, index: int) -> int:
    if index > 0 and _contains(value, index, 4, "CHAE"):
        r.append("K", "X")  # michael
        return index + 2
    if _condition_ch0(value, index):
        r.append("K")
        return index + 2
    if _condition_ch1(value, index):
        r.append("K")
        return index + 2
    if index > 0:
        if _contains(value, 0, 2, "MC"):
            r.append("K")
        else:
            r.append("X", "K")
    else:
        r.append("X")
    return index + 2


def _handle_d(value: str, r: _Result, index: int) -> int:
    if _contains(value, index, 2, "DG"):
        if _contains(value, index + 2, 1, "I", "E", "Y"):
            r.append("J")  # edge
            index += 3
        else:
            r.append("TK")  # edgar
            index += 2
    elif _contains(value, index, 2, "DT", "DD"):
        r.append("T")
        index += 2
    else:
        r.append("T")
        index += 1
    return index


def _handle_g(value: str, r: _Result, index: int, slavo: bool) -> int:
    if _char_at(value, index + 1) == "H":
        return _handle_gh(value, r, index)
    if _char_at(value, index + 1) == "N":
        if index == 1 and _is_vowel(_char_at(value, 0)) and not slavo:
            r.append("KN", "N")
        elif (
            not _contains(value, index + 2, 2, "EY")
            and _char_at(value, index + 1) != "Y"
            and not slavo
        ):
            r.append("N", "KN")
        else:
            r.append("KN")
        return index + 2
    if _contains(value, index + 1, 2, "LI") and not slavo:
        r.append("KL", "L")
        return index + 2
    if index == 0 and (
        _char_at(value, index + 1) == "Y"
        or _contains(value, index + 1, 2, *_ES_EP_EB_EL_EY_IB_IL_IN_IE_EI_ER)
    ):
        r.append("K", "J")  # ges-, gep- initial
        return index + 2
    if (
        _contains(value, index + 1, 2, "ER")
        or _char_at(value, index + 1) == "Y"
    ) and not _contains(
        value, 0, 6, "DANGER", "RANGER", "MANGER"
    ) and not _contains(
        value, index - 1, 1, "E", "I"
    ) and not _contains(value, index - 1, 3, "RGY", "OGY"):
        r.append("K", "J")
        return index + 2
    if _contains(value, index + 1, 1, "E", "I", "Y") or _contains(
        value, index - 1, 4, "AGGI", "OGGI"
    ):
        if (
            _contains(value, 0, 4, "VAN ", "VON ")
            or _contains(value, 0, 3, "SCH")
            or _contains(value, index + 1, 2, "ET")
        ):
            r.append("K")
        elif _contains(value, index + 1, 4, "IER "):
            r.append("J")
        else:
            r.append("J", "K")
        return index + 2
    if _char_at(value, index + 1) == "G":
        return_index = index + 2
        r.append("K")
        return return_index
    r.append("K")
    return index + 1


def _handle_gh(value: str, r: _Result, index: int) -> int:
    if index > 0 and not _is_vowel(_char_at(value, index - 1)):
        r.append("K")
        return index + 2
    if index == 0:
        if _char_at(value, index + 2) == "I":
            r.append("J")
        else:
            r.append("K")
        return index + 2
    if (
        (index > 1 and _contains(value, index - 2, 1, "B", "H", "D"))
        or (index > 2 and _contains(value, index - 3, 1, "B", "H", "D"))
        or (index > 3 and _contains(value, index - 4, 1, "B", "H"))
    ):
        return index + 2  # hugh / ghoul silent gh
    if (
        index > 2
        and _char_at(value, index - 1) == "U"
        and _contains(value, index - 3, 1, "C", "G", "L", "R", "T")
    ):
        r.append("F")  # laugh, cough
    elif index > 0 and _char_at(value, index - 1) != "I":
        r.append("K")
    return index + 2


def _handle_h(value: str, r: _Result, index: int) -> int:
    # only keep H between vowels or at start before a vowel
    if (index == 0 or _is_vowel(_char_at(value, index - 1))) and _is_vowel(
        _char_at(value, index + 1)
    ):
        r.append("H")
        return index + 2
    return index + 1


def _handle_j(value: str, r: _Result, index: int, slavo: bool) -> int:
    if _contains(value, index, 4, "JOSE") or _contains(value, 0, 4, "SAN "):
        # spanish: jose / san jacinto
        if (
            index == 0 and _char_at(value, index + 4) == " "
        ) or len(value) == 4 or _contains(value, 0, 4, "SAN "):
            r.append("H")
        else:
            r.append("J", "H")
        index += 1
    else:
        if index == 0 and not _contains(value, index, 4, "JOSE"):
            r.append("J", "A")
        elif (
            _is_vowel(_char_at(value, index - 1))
            and not slavo
            and (
                _char_at(value, index + 1) == "A"
                or _char_at(value, index + 1) == "O"
            )
        ):
            r.append("J", "H")
        elif index == len(value) - 1:
            r.append_primary("J")
            r.append_alternate(" ")
        elif not _contains(
            value, index + 1, 1, *_L_T_K_S_N_M_B_Z
        ) and not _contains(value, index - 1, 1, "S", "K", "L"):
            r.append("J")
        if _char_at(value, index + 1) == "J":
            index += 2
        else:
            index += 1
    return index


def _handle_l(value: str, r: _Result, index: int) -> int:
    if _char_at(value, index + 1) == "L":
        if _condition_l0(value, index):
            r.append_primary("L")  # spanish LL: alternate silent
        else:
            r.append("L")
        index += 2
    else:
        r.append("L")
        index += 1
    return index


def _handle_p(value: str, r: _Result, index: int) -> int:
    if _char_at(value, index + 1) == "H":
        r.append("F")
        return index + 2
    r.append("P")
    return index + (2 if _contains(value, index + 1, 1, "P", "B") else 1)


def _handle_r(value: str, r: _Result, index: int, slavo: bool) -> int:
    if (
        index == len(value) - 1
        and not slavo
        and _contains(value, index - 2, 2, "IE")
        and not _contains(value, index - 4, 2, "ME", "MA")
    ):
        r.append_alternate("R")  # french rogier: primary drops final R
    else:
        r.append("R")
    return index + (2 if _char_at(value, index + 1) == "R" else 1)


def _handle_s(value: str, r: _Result, index: int, slavo: bool) -> int:
    if _contains(value, index - 1, 3, "ISL", "YSL"):
        return index + 1  # island, isle: silent S
    if index == 0 and _contains(value, index, 5, "SUGAR"):
        r.append("X", "S")
        return index + 1
    if _contains(value, index, 2, "SH"):
        if _contains(value, index + 1, 4, "HEIM", "HOEK", "HOLM", "HOLZ"):
            r.append("S")  # germanic
        else:
            r.append("X")
        return index + 2
    if _contains(value, index, 3, "SIO", "SIA") or _contains(
        value, index, 4, "SIAN"
    ):
        if slavo:
            r.append("S")
        else:
            r.append("S", "X")
        return index + 3
    if (
        index == 0 and _contains(value, index + 1, 1, "M", "N", "L", "W")
    ) or _contains(value, index + 1, 1, "Z"):
        r.append("S", "X")
        return index + (2 if _contains(value, index + 1, 1, "Z") else 1)
    if _contains(value, index, 2, "SC"):
        return _handle_sc(value, r, index)
    if index == len(value) - 1 and _contains(value, index - 2, 2, "AI", "OI"):
        r.append_alternate("S")  # french resnais / artois
    else:
        r.append("S")
    return index + (2 if _contains(value, index + 1, 1, "S", "Z") else 1)


def _handle_sc(value: str, r: _Result, index: int) -> int:
    if _char_at(value, index + 2) == "H":
        if _contains(value, index + 3, 2, "OO", "ER", "EN", "UY", "ED", "EM"):
            if _contains(value, index + 3, 2, "ER", "EN"):
                r.append("X", "SK")  # schermerhorn / schenker
            else:
                r.append("SK")  # school, schooner
        elif index == 0 and not _is_vowel(_char_at(value, 3)) and _char_at(
            value, 3
        ) != "W":
            r.append("X", "S")
        else:
            r.append("X")
    elif _contains(value, index + 2, 1, "I", "E", "Y"):
        r.append("S")
    else:
        r.append("SK")
    return index + 3


def _handle_t(value: str, r: _Result, index: int) -> int:
    if _contains(value, index, 4, "TION"):
        r.append("X")
        return index + 3
    if _contains(value, index, 3, "TIA", "TCH"):
        r.append("X")
        return index + 3
    if _contains(value, index, 2, "TH") or _contains(value, index, 3, "TTH"):
        if _contains(value, index + 2, 2, "OM", "AM") or _contains(
            value, 0, 4, "VAN ", "VON "
        ) or _contains(value, 0, 3, "SCH"):
            r.append("T")  # thomas / thames germanic
        else:
            r.append("0", "T")  # theta
        return index + 2
    r.append("T")
    return index + (2 if _contains(value, index + 1, 1, "T", "D") else 1)


def _handle_w(value: str, r: _Result, index: int) -> int:
    if _contains(value, index, 2, "WR"):
        r.append("R")
        return index + 2
    if index == 0 and (
        _is_vowel(_char_at(value, index + 1))
        or _contains(value, index, 2, "WH")
    ):
        if _is_vowel(_char_at(value, index + 1)):
            r.append("A", "F")  # wasserman / vasserman
        else:
            r.append("A")  # wharton
        return index + 1
    if (
        (index == len(value) - 1 and _is_vowel(_char_at(value, index - 1)))
        or _contains(value, index - 1, 5, "EWSKI", "EWSKY", "OWSKI", "OWSKY")
        or _contains(value, 0, 3, "SCH")
    ):
        r.append_alternate("F")  # -owski polish
        return index + 1
    if _contains(value, index, 4, "WICZ", "WITZ"):
        r.append("TS", "FX")
        return index + 4
    return index + 1  # else skip


def _handle_x(value: str, r: _Result, index: int) -> int:
    if index == 0:
        r.append("S")
        return index + 1
    if not (
        index == len(value) - 1
        and (
            _contains(value, index - 3, 3, "IAU", "EAU")
            or _contains(value, index - 2, 2, "AU", "OU")
        )
    ):
        r.append("KS")  # french breaux keeps silent
    return index + (2 if _contains(value, index + 1, 1, "C", "X") else 1)


def _handle_z(value: str, r: _Result, index: int, slavo: bool) -> int:
    if _char_at(value, index + 1) == "H":
        r.append("J")  # zhao
        return index + 2
    if _contains(value, index + 1, 2, "ZO", "ZI", "ZA") or (
        slavo and index > 0 and _char_at(value, index - 1) != "T"
    ):
        r.append("S", "TS")
    else:
        r.append("S")
    return index + (2 if _char_at(value, index + 1) == "Z" else 1)


@lru_cache(maxsize=65536)
def double_metaphone(value: str, max_code_len: int = 4) -> tuple[str, str]:
    """Return ``(primary, alternate)`` codes (equal when no rule branches).
    Empty input or input with no encodable letters returns ``("", "")``."""
    value = value.strip().upper()
    if not value:
        return ("", "")
    slavo = _is_slavo_germanic(value)
    index = 1 if value[:2] in _SILENT_START else 0
    r = _Result(max_code_len)
    if value[0] == "X":
        r.append("S")  # xavier
        index = 1
    n = len(value)
    while not r.complete() and index <= n - 1:
        c = value[index]
        if c in "AEIOUY":
            if index == 0:
                r.append("A")
            index += 1
        elif c == "B":
            r.append("P")
            index += 2 if _char_at(value, index + 1) == "B" else 1
        elif c == "\xc7":  # C-cedilla
            r.append("S")
            index += 1
        elif c == "C":
            index = _handle_c(value, r, index)
        elif c == "D":
            index = _handle_d(value, r, index)
        elif c == "F":
            r.append("F")
            index += 2 if _char_at(value, index + 1) == "F" else 1
        elif c == "G":
            index = _handle_g(value, r, index, slavo)
        elif c == "H":
            index = _handle_h(value, r, index)
        elif c == "J":
            index = _handle_j(value, r, index, slavo)
        elif c == "K":
            r.append("K")
            index += 2 if _char_at(value, index + 1) == "K" else 1
        elif c == "L":
            index = _handle_l(value, r, index)
        elif c == "M":
            r.append("M")
            index += 2 if _condition_m0(value, index) else 1
        elif c == "N":
            r.append("N")
            index += 2 if _char_at(value, index + 1) == "N" else 1
        elif c == "\xd1":  # N-tilde
            r.append("N")
            index += 1
        elif c == "P":
            index = _handle_p(value, r, index)
        elif c == "Q":
            r.append("K")
            index += 2 if _char_at(value, index + 1) == "Q" else 1
        elif c == "R":
            index = _handle_r(value, r, index, slavo)
        elif c == "S":
            index = _handle_s(value, r, index, slavo)
        elif c == "T":
            index = _handle_t(value, r, index)
        elif c == "V":
            r.append("F")
            index += 2 if _char_at(value, index + 1) == "V" else 1
        elif c == "W":
            index = _handle_w(value, r, index)
        elif c == "X":
            index = _handle_x(value, r, index)
        elif c == "Z":
            index = _handle_z(value, r, index, slavo)
        else:
            index += 1
    return ("".join(r.primary), "".join(r.alternate))
