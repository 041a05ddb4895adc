"""Token/event domain: the semantic heart of the framework (SURVEY.md L2)."""

from .codec import EOS_ID, PAD_ID, UNK_ID, EventCodec
from .dataclasses import Event, Note, NoteEvent, sort_notes
from .event2note import (DecodeErrors, NoteDecodingState, event2note_event,
                         ids_to_events, merge_multi_channel_token_ids_to_notes,
                         merge_segment_token_ids_to_notes)
from .midi_io import midi2note, note_event2midi
from .note2event import (mix_notes, note2note_event, note_event2event,
                         notes_to_segment_events,
                         slice_multiple_note_events_and_ties_to_bundle,
                         slice_notes_to_segment, validate_notes)
from .task_manager import TaskManager
from .tokenizer import EventTokenizer, NoteEventTokenizer

__all__ = [
    "EventCodec", "EOS_ID", "PAD_ID", "UNK_ID",
    "Event", "Note", "NoteEvent", "sort_notes",
    "DecodeErrors", "NoteDecodingState", "event2note_event", "ids_to_events",
    "merge_segment_token_ids_to_notes", "merge_multi_channel_token_ids_to_notes",
    "midi2note", "note_event2midi",
    "mix_notes", "note2note_event", "note_event2event", "notes_to_segment_events",
    "slice_notes_to_segment", "slice_multiple_note_events_and_ties_to_bundle",
    "validate_notes", "TaskManager", "EventTokenizer", "NoteEventTokenizer",
]
