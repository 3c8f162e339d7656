"""Generate tests/fixtures/wordnet-mini/{data.noun,index.noun}.

A minimal Princeton-3.0-FORMAT noun database whose connectivity realizes
every gold value in the reference's WordNetDistanceMetricSpec.scala and
WS4JWordNetDistanceMetricSpec.scala. Lemma groupings and hypernym chains
follow WordNet 3.0 where the builder could verify them from public
documentation (entity/physical_entity/object/location/point/
geographic_point/address, abode+residence under address, staff->force+
personnel, district->region, the shared occupation/job and wage/salary
synsets, localization->determination+finding, family/household/house/
home/menage, legal_status->status); links marked CONSTRUCTED below stand
in for the full graph's denser connectivity so the mini db reproduces
the reference-measured DEPTHS exactly. It is NOT a verbatim extract of
WordNet 3.0 (offsets are synthetic, glosses abbreviated); on any host
with a full Princeton db the same gold pins run against the real thing.

Run: python tools/gen_wordnet_fixture.py   (writes the two files)
"""

from __future__ import annotations

import os

# (offset, [lemmas], [(ptr_symbol, target_offset)], gloss)
SYNSETS = [
    # physical chain (real WN 3.0 hypernym spine)
    (1, ["entity"], [("~", 2), ("~", 10)], "that which is perceived to exist"),
    (2, ["physical_entity"], [("@", 1), ("~", 3)], "an entity that has physical existence"),
    (3, ["object", "physical_object"], [("@", 2), ("~", 4)], "a tangible and visible entity"),
    (4, ["location"], [("@", 3), ("~", 5), ("~", 9)], "a point or extent in space"),
    (5, ["point"], [("@", 4), ("~", 6)], "the precise location of something"),
    (6, ["geographic_point", "geographical_point"], [("@", 5), ("~", 7)], "a point on the surface of the Earth"),
    (7, ["address"], [("@", 6), ("~", 8)], "the place where a person or organization can be found"),
    (8, ["abode", "residence"], [("@", 7)], "any address at which you dwell more than temporarily"),
    (9, ["region"], [("@", 4), ("~", 32)], "the extended spatial location of something"),
    # abstract chain (real WN 3.0 spine through act; direction->determination
    # and address_dest->direction are CONSTRUCTED depth-realizing links)
    (10, ["abstraction", "abstract_entity"], [("@", 1), ("~", 11)], "a general concept"),
    (11, ["psychological_feature"], [("@", 10), ("~", 12)], "a feature of the mental life"),
    (12, ["event"], [("@", 11), ("~", 13)], "something that happens"),
    (13, ["act", "deed", "human_action", "human_activity"], [("@", 12), ("~", 14)], "something that people do"),
    (14, ["determination", "finding"], [("@", 13), ("~", 15), ("~", 17)], "the act of determining properties"),
    (15, ["direction", "instruction"], [("@", 14), ("~", 16)], "a message describing how something is to be done"),
    (16, ["address", "destination", "name_and_address"], [("@", 15)], "written directions for finding a location"),
    (17, ["localization", "localisation", "location", "locating", "fix"], [("@", 14)], "a determination of the place where something is"),
    # people
    (20, ["person", "individual", "someone", "somebody", "mortal", "soul"], [("~", 21), ("~", 23)], "a human being"),
    (21, ["worker"], [("@", 20), ("~", 22)], "a person who works at a specific occupation"),
    (22, ["employee"], [("@", 21)], "a worker who is hired to perform a job"),
    # operator -> telephone set: CONSTRUCTED topic link (depth-4 realizer)
    (23, ["operator", "manipulator"], [("@", 20), (";c", 26)], "an agent that operates some apparatus or machine"),
    (24, ["customer", "client"], [("@", 25)], "someone who pays for goods or services"),
    (25, ["consumer"], [("~", 24)], "a person who uses goods or services"),
    (26, ["telephone", "phone", "telephone_set"], [("@", 27)], "electronic equipment that converts sound into signals"),
    (27, ["electronic_equipment"], [("~", 26)], "equipment that involves the controlled conduction of electrons"),
    # staff / personnel (real)
    (30, ["force", "personnel"], [("~", 31)], "group of people willing to obey orders"),
    (31, ["staff"], [("@", 30)], "personnel who assist their superior in carrying out a task"),
    (32, ["district", "territory", "territorial_dominion", "dominion"], [("@", 9)], "a region marked off for administrative purposes"),
    # sex / gender (real shared synset; round trip via femaleness)
    (33, ["sex", "gender", "sexuality"], [("@", 34), ("~", 35)], "the properties that distinguish organisms on the basis of their reproductive roles"),
    (34, ["physiological_property"], [("~", 33)], "a property having to do with the functioning of the body"),
    (35, ["femaleness", "muliebrity"], [("@", 33)], "the properties characteristic of the female sex"),
    # size / dimension via magnitude (real)
    (36, ["magnitude"], [("~", 37), ("~", 38)], "the property of relative size or extent"),
    (37, ["size"], [("@", 36)], "the physical magnitude of something"),
    (38, ["dimension"], [("@", 36)], "the magnitude of something in a particular direction"),
    # occupation / job shared synset (real)
    (39, ["occupation", "business", "job", "line_of_work", "line"], [("@", 40)], "the principal activity in your life"),
    (40, ["activity"], [("~", 39)], "any specific behavior"),
    # wage / salary shared synset (real)
    (41, ["wage", "pay", "earnings", "remuneration", "salary"], [("@", 42)], "something that remunerates"),
    (42, ["regular_payment"], [("~", 41)], "a payment made at regular times"),
    # department / section via division
    (43, ["division"], [("~", 44), ("~", 45)], "an administrative unit"),
    (44, ["department"], [("@", 43)], "a specialized division of a large organization"),
    (45, ["section", "subdivision"], [("@", 43)], "a self-contained part of a larger composition"),
    # house / home / lot (building->site and lot->site are CONSTRUCTED
    # depth-realizing links; the lemma groupings are real)
    (46, ["house"], [("@", 47)], "a dwelling that serves as living quarters"),
    (47, ["building", "edifice"], [("@", 48), ("#p", 50)], "a structure that has a roof and walls"),
    (48, ["structure", "construction"], [("~", 47)], "a thing constructed"),
    (49, ["family", "household", "house", "home", "menage"], [("@", 51)], "a social unit living together"),
    (50, ["site", "land_site"], [("~", 52)], "the piece of land on which something is located"),
    (51, ["social_unit", "unit"], [("~", 49)], "an organization regarded as part of a larger social group"),
    (52, ["lot"], [("@", 50)], "a parcel of land having fixed boundaries"),
    # nationality / citizenship via status -> legal_status (real-shaped)
    (53, ["status", "position"], [("~", 54), ("~", 55)], "the relative position in a society"),
    (54, ["nationality"], [("@", 53)], "the status of belonging to a particular nation"),
    (55, ["legal_status"], [("@", 53), ("~", 56)], "a status defined by law"),
    (56, ["citizenship"], [("@", 55)], "the status of a citizen with rights and duties"),
    (57, ["description", "verbal_description"], [], "a statement that represents something in words"),
]


def _fmt_data() -> str:
    lines = []
    for off, lemmas, ptrs, gloss in SYNSETS:
        words = " ".join(f"{w} 0" for w in lemmas)
        pstr = " ".join(f"{sym} {t:08d} n 0000" for sym, t in ptrs)
        body = (f"{off:08d} 03 n {len(lemmas):02x} {words} "
                f"{len(ptrs):03d}" + (f" {pstr}" if pstr else ""))
        lines.append(f"{body} | {gloss}")
    return "\n".join(lines) + "\n"


def _fmt_index() -> str:
    by_lemma: dict[str, list[int]] = {}
    for off, lemmas, _ptrs, _g in SYNSETS:
        for w in lemmas:
            by_lemma.setdefault(w, []).append(off)
    lines = []
    for w in sorted(by_lemma):
        offs = by_lemma[w]
        # lemma pos synset_cnt p_cnt [symbols] sense_cnt tagsense_cnt offsets
        lines.append(
            f"{w} n {len(offs)} 1 @ {len(offs)} 0 "
            + " ".join(f"{o:08d}" for o in offs)
        )
    return "\n".join(lines) + "\n"


def main() -> None:
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "tests", "fixtures", "wordnet-mini")
    os.makedirs(out, exist_ok=True)
    with open(os.path.join(out, "data.noun"), "w") as f:
        f.write(_fmt_data())
    with open(os.path.join(out, "index.noun"), "w") as f:
        f.write(_fmt_index())
    print(f"wrote {out}/data.noun + index.noun ({len(SYNSETS)} synsets)")


if __name__ == "__main__":
    main()
