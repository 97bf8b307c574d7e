"""Custom operators with no native Spark primitive (SURVEY.md §4 "genuinely
custom" table). Each is a composition of DataFrame ops — shuffle-aware, no
driver-side loops — or an Arrow-batched pandas UDF where composition can't
express the semantics."""
