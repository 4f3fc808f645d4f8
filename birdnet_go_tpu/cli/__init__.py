"""Command-line interface (reference: cmd/root.go + subcommands).

Subcommands: analyze (offline file/directory analysis), serve (realtime
server), benchmark (device inference throughput), rangefilter (print
included species for a location/week).
"""
