"""Sharding / multi-chip layer (SURVEY.md §2.12): device mesh setup,
halo exchange for carried DSP state, sharded runners."""
