Feature: TemporalSemantics

  Background:
    Given an empty graph
    And having executed:
      """
      CREATE (:Ev {name: 'a', d: date('2024-03-15')}),
             (:Ev {name: 'b', d: date('2024-03-18')}),
             (:Ev {name: 'c', d: date('2023-12-31')})
      """

  Scenario: Date accessors
    When executing query:
      """
      MATCH (e:Ev {name: 'a'})
      RETURN e.d.year AS y, e.d.month AS m, e.d.day AS day
      """
    Then the result should be, in any order:
      | y    | m | day |
      | 2024 | 3 | 15  |
    And no side effects

  Scenario: Date comparison and ordering
    When executing query:
      """
      MATCH (e:Ev) WHERE e.d > date('2024-01-01')
      RETURN e.name AS name ORDER BY e.d
      """
    Then the result should be, in order:
      | name |
      | 'a'  |
      | 'b'  |
    And no side effects

  Scenario: duration.between two dates
    When executing query:
      """
      MATCH (a:Ev {name: 'a'}), (b:Ev {name: 'b'})
      RETURN duration.between(a.d, b.d).days AS days
      """
    Then the result should be, in any order:
      | days |
      | 3    |
    And no side effects

  Scenario: Adding a duration to a date
    When executing query:
      """
      MATCH (e:Ev {name: 'a'})
      RETURN (e.d + duration('P10D')).day AS day, (e.d + duration('P10D')).month AS m
      """
    Then the result should be, in any order:
      | day | m |
      | 25  | 3 |
    And no side effects

  Scenario: Weekday and quarter accessors
    When executing query:
      """
      MATCH (e:Ev {name: 'a'})
      RETURN e.d.dayOfWeek AS dow, e.d.quarter AS q
      """
    Then the result should be, in any order:
      | dow | q |
      | 5   | 1 |
    And no side effects
