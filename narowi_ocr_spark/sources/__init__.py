"""Sources and sinks: synthetic page corpus, testdata readers, writers."""
