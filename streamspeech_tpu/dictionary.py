"""Symbol dictionary, layout-compatible with the reference vocabularies.

Matches fairseq's index layout (`/root/reference/fairseq/fairseq/data/dictionary.py:21-42`):
special symbols ``<s>``(0) ``<pad>``(1) ``</s>``(2) ``<unk>``(3) followed by the file
symbols in order. Dict files are ``"<symbol> <count>"`` lines (e.g.
``configs/fr-en/src_unigram6000/spm_unigram_fr.txt``). Unit vocabularies are built from
a code size (`fairseq/fairseq/tasks/speech_to_speech.py:270-274`), and the CTC task
appends ``<blank>`` last (`researches/ctc_unity/tasks/speech_to_speech_ctc.py:14-19`).
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Optional


class Dictionary:
    def __init__(
        self,
        bos: str = "<s>",
        pad: str = "<pad>",
        eos: str = "</s>",
        unk: str = "<unk>",
        extra_special_symbols: Optional[Iterable[str]] = None,
    ):
        self.bos_word, self.pad_word, self.eos_word, self.unk_word = bos, pad, eos, unk
        self.symbols: List[str] = []
        self.count: List[int] = []
        self.indices: Dict[str, int] = {}
        self.bos_index = self.add_symbol(bos)
        self.pad_index = self.add_symbol(pad)
        self.eos_index = self.add_symbol(eos)
        self.unk_index = self.add_symbol(unk)
        if extra_special_symbols:
            for s in extra_special_symbols:
                self.add_symbol(s)
        self.nspecial = len(self.symbols)
        self.blank_index: Optional[int] = None

    def __len__(self) -> int:
        return len(self.symbols)

    def __getitem__(self, idx: int) -> str:
        if 0 <= idx < len(self.symbols):
            return self.symbols[idx]
        return self.unk_word

    def __eq__(self, other) -> bool:
        return isinstance(other, Dictionary) and self.indices == other.indices

    def add_symbol(self, word: str, n: int = 1) -> int:
        if word in self.indices:
            idx = self.indices[word]
            self.count[idx] += n
            return idx
        idx = len(self.symbols)
        self.indices[word] = idx
        self.symbols.append(word)
        self.count.append(n)
        return idx

    def add_blank(self, symbol: str = "<blank>") -> int:
        """Append the CTC blank last, as the reference CTC task does."""
        self.blank_index = self.add_symbol(symbol)
        return self.blank_index

    def index(self, word: str) -> int:
        return self.indices.get(word, self.unk_index)

    def bos(self) -> int:
        return self.bos_index

    def pad(self) -> int:
        return self.pad_index

    def eos(self) -> int:
        return self.eos_index

    def unk(self) -> int:
        return self.unk_index

    def blank(self) -> int:
        if self.blank_index is None:
            raise ValueError("dictionary has no <blank>; call add_blank() first")
        return self.blank_index

    def encode_line(
        self, line: str, append_eos: bool = True, add_if_not_exist: bool = False
    ) -> List[int]:
        words = line.split()
        ids = []
        for w in words:
            if add_if_not_exist:
                ids.append(self.add_symbol(w))
            else:
                ids.append(self.index(w))
        if append_eos:
            ids.append(self.eos_index)
        return ids

    def string(
        self,
        ids: Iterable[int],
        remove_special: bool = True,
        spm_to_text: bool = False,
    ) -> str:
        toks = []
        special = {self.bos_index, self.pad_index, self.eos_index}
        if self.blank_index is not None:
            special.add(self.blank_index)
        for i in ids:
            i = int(i)
            if remove_special and i in special:
                continue
            toks.append(self[i])
        s = " ".join(toks)
        if spm_to_text:
            s = s.replace(" ", "").replace("▁", " ").strip()
        return s

    @classmethod
    def load(cls, path: str) -> "Dictionary":
        d = cls()
        with open(path, "r", encoding="utf-8") as f:
            for line in f:
                line = line.rstrip("\n")
                if not line:
                    continue
                try:
                    word, cnt = line.rsplit(" ", 1)
                    n = int(cnt)
                except ValueError:
                    word, n = line, 1
                d.add_symbol(word, n)
        return d

    @classmethod
    def units(cls, code_size: int) -> "Dictionary":
        """Unit dictionary: symbols "0".."code_size-1" after the 4 specials."""
        d = cls()
        for i in range(code_size):
            d.add_symbol(str(i))
        return d

    def save(self, path: str) -> None:
        with open(path, "w", encoding="utf-8") as f:
            for sym, cnt in zip(
                self.symbols[self.nspecial :], self.count[self.nspecial :]
            ):
                f.write(f"{sym} {cnt}\n")
