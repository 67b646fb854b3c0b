"""Sources & sinks: deterministic synthetic pages corpus (FIXTURES.md §1),
the mock4 golden graph (reference crawler/mock/mockrpc.go:3), testdata
loaders, and snapshot checkpoint I/O."""
