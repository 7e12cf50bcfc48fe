"""Source connectors (SURVEY §2.A): XML documents, pipe-delimited NEMSIS
data-dictionary exports, vendor Excel workbooks, binary files."""
