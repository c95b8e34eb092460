"""Sources & sinks: synthetic pages generator, datafile/timemap parsers, exports."""
