"""Streaming & transactional sink: snapshot lake table, replay, commit."""
