"""off_topic_memento_toolkit_spark — a PySpark-native analytics engine with the
query & data-processing capabilities of oduwsdl/off-topic-memento-toolkit (OTMT).

Design: everything is declared with the DataFrame/SQL API so Catalyst picks the
physical plan; Python appears only inside Arrow-batched pandas UDFs for the
text kernels the reference computes with nltk/justext/simhash/sklearn
(reimplemented here from scratch against their published semantics — none of
those libraries are imported).

Reference behavior citations use ``file:line`` into /root/reference (OTMT).
"""

__version__ = "0.1.0"
