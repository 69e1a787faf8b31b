"""Column-level expression libraries (cleaning / text / vectors).

Everything here returns ``pyspark.sql.Column`` built from built-in functions
only — JVM-side, whole-stage-codegen-eligible, zero Python in the data path
(SURVEY.md §2.12: the reference's ``Series.apply`` lambdas are all
expressible as Catalyst expressions).
"""
