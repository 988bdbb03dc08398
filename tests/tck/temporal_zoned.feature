Feature: TemporalZoned

  # Zoned datetime / time (functions/compiler.py CTDateTime section,
  # round 8) — beyond reference parity: the reference documents zoned
  # temporal types as unsupported
  # (documentation/asciidoc/cypher-cypher9-features.adoc:32-54).
  # CTDateTime = struct(instant, zone); accessors read the LOCAL wall
  # clock in the value's zone, comparisons order by instant, equality
  # needs instant AND zone, and duration arithmetic is calendar-based in
  # the value's own zone (DST-aware).

  Background:
    Given an empty graph
    And having executed:
      """
      CREATE (:N {k: 1})
      """

  Scenario: Constructor from ISO string with offset
    When executing query:
      """
      WITH datetime('2024-03-15T10:30:00+02:00') AS dt
      RETURN dt.epochSeconds AS e, dt.hour AS h, dt.timezone AS z
      """
    Then the result should be, in any order:
      | e          | h  | z        |
      | 1710491400 | 10 | '+02:00' |
    And no side effects

  Scenario: Constructor with bracketed region zone
    When executing query:
      """
      WITH datetime('2024-03-15T10:30:00[Europe/Paris]') AS dt
      RETURN dt.epochSeconds AS e, dt.offset AS o, dt.timezone AS z
      """
    Then the result should be, in any order:
      | e          | o        | z              |
      | 1710495000 | '+01:00' | 'Europe/Paris' |
    And no side effects

  Scenario: Map constructor resolves the zone offset at the instant
    When executing query:
      """
      WITH datetime({year: 1995, month: 11, day: 5, hour: 12,
                     timezone: 'America/New_York'}) AS est,
           datetime({year: 1995, month: 7, day: 5, hour: 12,
                     timezone: 'America/New_York'}) AS edt
      RETURN est.offsetSeconds AS winter, edt.offsetSeconds AS summer
      """
    Then the result should be, in any order:
      | winter | summer |
      | -18000 | -14400 |
    And no side effects

  Scenario: Epoch-based construction
    When executing query:
      """
      WITH datetime({epochSeconds: 1710498600, timezone: 'Europe/Paris'}) AS dt
      RETURN dt.hour AS h, dt.minute AS m
      """
    Then the result should be, in any order:
      | h  | m  |
      | 11 | 30 |
    And no side effects

  Scenario: Local accessors read the wall clock in the zone
    When executing query:
      """
      WITH datetime('2024-03-15T23:45:10.25+05:30') AS dt
      RETURN dt.year AS y, dt.day AS d, dt.hour AS h, dt.minute AS mi,
             dt.second AS s, dt.millisecond AS ms
      """
    Then the result should be, in any order:
      | y    | d  | h  | mi | s  | ms  |
      | 2024 | 15 | 23 | 45 | 10 | 250 |
    And no side effects

  Scenario: Comparison is by instant
    When executing query:
      """
      RETURN datetime('2024-01-01T06:00:00+02:00')
               < datetime('2024-01-01T05:00:00Z') AS lt,
             datetime('2024-01-01T05:00:00Z')
               = datetime('2024-01-01T07:00:00+02:00') AS eq
      """
    Then the result should be, in any order:
      | lt   | eq    |
      | true | false |
    And no side effects

  Scenario: Calendar day addition across spring-forward is 23 real hours
    When executing query:
      """
      WITH datetime('2024-03-30T12:00:00[Europe/Paris]') AS dt
      WITH dt, dt + duration('P1D') AS nxt
      RETURN nxt.hour AS h, nxt.epochSeconds - dt.epochSeconds AS real_secs
      """
    Then the result should be, in any order:
      | h  | real_secs |
      | 12 | 82800     |
    And no side effects

  Scenario: duration.between on zoned datetimes measures elapsed instants
    When executing query:
      """
      RETURN duration.between(datetime('2024-03-15T10:00:00Z'),
                              datetime('2024-03-15T13:30:00+02:00')).minutes AS m
      """
    Then the result should be, in any order:
      | m  |
      | 90 |
    And no side effects

  Scenario: toString renders local time, offset and region suffix
    When executing query:
      """
      RETURN toString(datetime('2024-03-15T10:30:00[Europe/Paris]')) AS a,
             toString(datetime('2024-03-15T10:30:00.5+02:00')) AS b,
             toString(datetime('2024-03-15T10:30:00Z')) AS c
      """
    Then the result should be, in any order:
      | a                                      | b                            | c                      |
      | '2024-03-15T10:30:00+01:00[Europe/Paris]' | '2024-03-15T10:30:00.5+02:00' | '2024-03-15T10:30:00Z' |
    And no side effects

  Scenario: datetime.truncate keeps the zone and truncates local time
    When executing query:
      """
      WITH datetime.truncate('day', datetime('2024-03-15T10:30:00[Europe/Paris]')) AS dt
      RETURN dt.hour AS h, dt.timezone AS z, dt.epochSeconds AS e
      """
    Then the result should be, in any order:
      | h | z              | e          |
      | 0 | 'Europe/Paris' | 1710457200 |
    And no side effects

  Scenario: Zoned time accessors and offset
    When executing query:
      """
      WITH time('10:30:00.002+05:30') AS t
      RETURN t.hour AS h, t.minute AS m, t.millisecond AS ms,
             t.offsetSeconds AS off
      """
    Then the result should be, in any order:
      | h  | m  | ms | off   |
      | 10 | 30 | 2  | 19800 |
    And no side effects

  Scenario: Zoned time comparison normalizes to UTC
    When executing query:
      """
      RETURN time('08:30:00Z') < time('10:30:00+01:00') AS lt,
             time('10:30:00+02:00') = time('09:30:00+01:00') AS eq
      """
    Then the result should be, in any order:
      | lt   | eq    |
      | true | false |
    And no side effects

  Scenario: Zoned time duration arithmetic wraps around midnight
    When executing query:
      """
      RETURN toString(time('23:30:00+02:00') + duration('PT1H')) AS t
      """
    Then the result should be, in any order:
      | t                |
      | '00:30:00+02:00' |
    And no side effects

  Scenario: Datetime round-trips through a property-driven map constructor
    When executing query:
      """
      MATCH (n:N)
      WITH datetime({year: 2020 + n.k, month: 2, day: 27 + n.k,
                     timezone: 'UTC'}) AS dt
      RETURN dt.year AS y, dt.month AS mo, dt.day AS d
      """
    Then the result should be, in any order:
      | y    | mo | d  |
      | 2021 | 2  | 28 |
    And no side effects
