"""Interactive labeling & prediction-validation consoles (SURVEY §2.13).

Reference: ``RunLabelManual`` / ``LabelManualInterface`` (matcher/.../runner/
RunLabelManual.scala, interface/LabelManualInterface.scala:8-69) — a console
pager over a dataset's attributes with commands to list/create/delete classes
and label attributes, saving a semantic-type labels CSV; and
``RunSemanticTypePredictionValidation`` (runner/
RunSemanticTypePredictionValidation.scala) — page through predicted labels,
confirm or correct each, writing back the 6-column validated rows that
``SemanticTypeLabelsLoader`` consumes (unvalidated stay ``"?"``).

I/O streams are injected so the console is scriptable/testable; the CLI
``label`` and ``validate`` subcommands wire stdin/stdout. The data side
stays column-metadata-sized (attribute ids + a value sample), matching the
reference's whole-console-in-driver design.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import IO

PAGE_SIZE = 10  # the reference's AttributesPager page

HELP = """Commands:

    h - Show this help screen for commands.
    s - Show all attributes.
    m - Show more (next page).
    c - List classes.
    q - Discard changes and exit.
    x - Save and exit.
    nc <classname>  - Create new class.
    dc <classname>  - Delete class.
    l <attr_index> <class_name> - Label attribute.
"""


@dataclass
class LabelingConsole:
    """LabelManualInterface.scala:8-69 command loop."""

    attributes: list[str]  # attr ids (name@table@dataset)
    classes: list[str]
    labels: dict[str, str] = field(default_factory=dict)
    _page: int = 0

    def _show_page(self, out: IO[str]) -> None:
        lo = self._page * PAGE_SIZE
        page = self.attributes[lo : lo + PAGE_SIZE]
        for i, attr in enumerate(page, start=lo):
            out.write(f"{i}: {attr}[{self.labels.get(attr, 'unknown')}]\n")
        if lo + PAGE_SIZE < len(self.attributes):
            out.write("    Type 'm' to show more.\n")

    def run(self, inp: IO[str], out: IO[str]) -> bool:
        """Returns True when the session ended with save ('x')."""
        out.write(HELP)
        for raw in inp:
            cmd = raw.strip()
            if not cmd:
                continue
            op, _, arg = cmd.partition(" ")
            op = op.lower()
            if op == "q":
                return False
            if op == "x":
                return True
            if op == "h":
                out.write(HELP)
            elif op == "s":
                self._page = 0
                self._show_page(out)
            elif op == "m":
                if (self._page + 1) * PAGE_SIZE < len(self.attributes):
                    self._page += 1
                    self._show_page(out)
                else:
                    out.write("Nothing to show.\n")
            elif op == "c":
                out.write("\n".join(self.classes) + "\n")
            elif op == "nc" and arg:
                if arg not in self.classes:
                    self.classes.append(arg)
            elif op == "dc" and arg:
                if arg in self.classes:
                    self.classes.remove(arg)
                    self.labels = {a: c for a, c in self.labels.items() if c != arg}
            elif op == "l":
                idx_s, _, cls = arg.partition(" ")
                try:
                    idx = int(idx_s)
                    attr = self.attributes[idx]
                except (ValueError, IndexError):
                    out.write(f"Invalid attribute index: {idx_s}\n")
                    continue
                if cls not in self.classes:
                    out.write(f"Unknown class: {cls} (create with 'nc {cls}')\n")
                    continue
                self.labels[attr] = cls
            else:
                out.write(f"Unknown command: {cmd}\n")
        return False

    def save(self, path: str) -> None:
        """Write the 2-column manual labels CSV SemanticTypeLabelsLoader reads."""
        with open(path, "w", encoding="utf-8") as f:
            f.write("attr_id,class\n")
            for attr in self.attributes:
                if attr in self.labels:
                    f.write(f"{attr},{self.labels[attr]}\n")


@dataclass
class ValidationConsole:
    """RunSemanticTypePredictionValidation flow: for each predicted label,
    ``y`` confirms (actual = predicted), ``n`` leaves it unvalidated (``?``),
    a class name corrects it, ``q`` stops early."""

    # rows: (attr_id, predicted_class, confidence, date_predicted)
    predictions: list[tuple[str, str, float, str]]
    validated: dict[str, str] = field(default_factory=dict)

    def run(self, inp: IO[str], out: IO[str], date_validated: str = "") -> None:
        it = iter(inp)
        for attr_id, predicted, confidence, _date in self.predictions:
            out.write(f"{attr_id} predicted={predicted} ({confidence:.2f}) [y/n/<class>/q]: \n")
            try:
                answer = next(it).strip()
            except StopIteration:
                break
            if answer.lower() == "q":
                break
            if answer.lower() == "y":
                self.validated[attr_id] = predicted
            elif answer.lower() != "n" and answer:
                self.validated[attr_id] = answer

    def save(self, path: str, date_validated: str = "") -> None:
        """Write 6-column predicted-label rows; unvalidated keep ``"?"``
        (the shape SemanticTypeLabelsLoader skips, LabelsLoader.scala:62-66)."""
        with open(path, "w", encoding="utf-8") as f:
            f.write("attr_id,predicted,confidence,date_predicted,actual,date_validated\n")
            for attr_id, predicted, confidence, date_predicted in self.predictions:
                actual = self.validated.get(attr_id, "?")
                dv = date_validated if attr_id in self.validated else ""
                f.write(f"{attr_id},{predicted},{confidence},{date_predicted},{actual},{dv}\n")
