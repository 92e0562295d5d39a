"""Tiny embedded datasets for the generator/transformer library.

The reference embeds ~180k LoC of datasets
(/root/reference/worker/pkg/benthos/transformers/data-sets/); we need
only the semantics, so each list is small but shaped the same (names by
length, cities, states, etc.). All selection is seeded-hash based, so
list size affects variety, not correctness.
"""

from __future__ import annotations

FIRST_NAMES = [
    "Ada", "Ben", "Cora", "Dev", "Elio", "Fay", "Gus", "Hana", "Ivan",
    "Jade", "Kai", "Lena", "Mona", "Nils", "Omar", "Pia", "Quinn", "Rosa",
    "Sam", "Tess", "Uma", "Vera", "Wade", "Xena", "Yuri", "Zoe",
    "Amelia", "Bennett", "Camille", "Dorothea", "Evangeline",
]

LAST_NAMES = [
    "Ames", "Bond", "Cruz", "Dias", "Egan", "Ford", "Gray", "Hale", "Iser",
    "Jung", "Katz", "Lowe", "Mora", "Nash", "Ortiz", "Park", "Reyes",
    "Sato", "Tran", "Usher", "Vance", "Wong", "Xu", "Yang", "Zimmer",
    "Abernathy", "Blackwood", "Castellano", "Davenport", "Ellington",
]

CITIES = [
    "Springfield", "Riverton", "Lakewood", "Fairview", "Georgetown",
    "Madison", "Clinton", "Ashland", "Burlington", "Dayton",
]

STATES = ["CA", "NY", "TX", "WA", "IL", "MA", "CO", "GA", "OR", "FL"]

STATE_NAMES = [
    "California", "New York", "Texas", "Washington", "Illinois",
    "Massachusetts", "Colorado", "Georgia", "Oregon", "Florida",
]

COUNTRIES = [
    ("US", "United States"), ("CA", "Canada"), ("GB", "United Kingdom"),
    ("DE", "Germany"), ("FR", "France"), ("JP", "Japan"), ("BR", "Brazil"),
    ("IN", "India"), ("AU", "Australia"), ("MX", "Mexico"),
]

STREETS = [
    "Maple St", "Oak Ave", "Cedar Ln", "Elm Dr", "Pine Rd",
    "Birch Blvd", "Walnut Way", "Chestnut Ct", "Spruce Pl", "Willow Ter",
]

EMAIL_DOMAINS = [
    "example.com", "mail.test", "inbox.example", "post.example",
    "corp.example", "demo.test",
]

BUSINESS_WORDS = [
    "Acme", "Globex", "Initech", "Umbra", "Vertex", "Nimbus", "Quanta",
    "Helix", "Zephyr", "Apex",
]

BUSINESS_SUFFIXES = ["Inc", "LLC", "Corp", "Group", "Labs", "Co"]

GENDERS = ["female", "male", "nonbinary", "undisclosed"]

# deny-word list used by the pii_text regex recognizers in tests
DEFAULT_DENY_WORDS: list[str] = []

# names-by-length index (preserve_length lookups, like the reference's
# map-by-length datasets)
def by_length(names: list[str]) -> dict[int, list[str]]:
    out: dict[int, list[str]] = {}
    for n in names:
        out.setdefault(len(n), []).append(n)
    return out


FIRST_BY_LEN = by_length(FIRST_NAMES)
LAST_BY_LEN = by_length(LAST_NAMES)
