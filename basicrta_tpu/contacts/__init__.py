"""Contact-map extraction and residence-event construction."""

from basicrta_tpu.contacts.records import ContactRecords, ContactEvents
from basicrta_tpu.contacts.events import merge_events
from basicrta_tpu.contacts.distances import min_dist_per_residue_pair
from basicrta_tpu.contacts.mapper import MapContacts, ProcessContacts

__all__ = [
    "ContactRecords",
    "ContactEvents",
    "merge_events",
    "min_dist_per_residue_pair",
    "MapContacts",
    "ProcessContacts",
]
